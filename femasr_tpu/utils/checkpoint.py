"""Checkpoint I/O: flax-msgpack pytrees + reference-format interop.

Capability parity with the reference checkpoint semantics
(/root/reference/basicsr/models/base_model.py: save_network:211-256 with
retry, load_network:258-323 non-strict, save_training_state:325-358).
Network weights are stored as flax msgpack (`.ckpt`); full training state
uses orbax when available.
"""

from __future__ import annotations

import os
import time
from typing import Any, Optional

import numpy as np


def save_pytree(tree: Any, path: str, retry: int = 3) -> None:
    """Serialize a pytree to msgpack with write retries (base_model.py:241-256)."""
    from flax import serialization
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    data = serialization.to_bytes(tree)
    for attempt in range(retry):
        try:
            tmp = path + '.tmp'
            with open(tmp, 'wb') as f:
                f.write(data)
            os.replace(tmp, path)
            return
        except OSError as e:  # pragma: no cover - io flake path
            print(f'[checkpoint] save failed ({e}), retry {attempt + 1}')
            time.sleep(1)
    raise IOError(f'Cannot save {path} after {retry} attempts.')


def load_pytree(path: str, target: Optional[Any] = None) -> Any:
    """Load a msgpack pytree; with `target`, restores into its structure."""
    from flax import serialization
    with open(path, 'rb') as f:
        data = f.read()
    if target is not None:
        return serialization.from_bytes(target, data)
    return serialization.msgpack_restore(data)


def to_host(tree: Any) -> Any:
    """Device -> host numpy copy of a pytree."""
    import jax
    return jax.tree.map(lambda x: np.asarray(x), tree)


# -- orbax backend (optional, for multi-host / async checkpointing) ---------

def save_pytree_orbax(tree: Any, path: str) -> None:
    """Orbax save (atomic, multi-host-aware). Directory-based checkpoints."""
    import orbax.checkpoint as ocp
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.abspath(path), to_host(tree), force=True)


def load_pytree_orbax(path: str, target: Optional[Any] = None) -> Any:
    import orbax.checkpoint as ocp
    ckptr = ocp.PyTreeCheckpointer()
    if target is not None:
        return ckptr.restore(os.path.abspath(path), item=target)
    return ckptr.restore(os.path.abspath(path))
