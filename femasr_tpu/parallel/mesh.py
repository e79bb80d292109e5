"""Device mesh + sharding utilities: the TPU-native replacement for the
reference's NCCL process groups.

Parity mapping (SURVEY.md §2.10): DDP gradient allreduce -> psum inserted by
XLA under jit over a ('data',) mesh axis; EnlargedSampler rank sharding ->
per-process host loading + make_array_from_process_local_data; master_only ->
jax.process_index() == 0. Tensor parallelism for the codebook matmul and the
Swin attention/FFN uses a second 'model' axis.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(data: Optional[int] = None, model: int = 1,
                devices=None) -> Mesh:
    """Create a ('data', 'model') mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, f'{data}x{model} != {n} devices'
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, ('data', 'model'))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch axis over 'data', replicate the rest."""
    return NamedSharding(mesh, P('data'))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# --- tensor-parallel parameter layout -------------------------------------
# Rules map regex over the flattened param path to a PartitionSpec. Megatron
# layout for the Swin blocks: qkv/fc1 split the output features, proj/fc2
# split the input features; the HRP codebook splits its code axis so the
# distance matmul shards over 'model'.
TP_RULES: Sequence[Tuple[str, P]] = (
    (r'.*attn/qkv/kernel$', P(None, 'model')),
    (r'.*attn/qkv/bias$', P('model')),
    (r'.*attn/proj/kernel$', P('model', None)),
    (r'.*mlp/fc1/kernel$', P(None, 'model')),
    (r'.*mlp/fc1/bias$', P('model')),
    (r'.*mlp/fc2/kernel$', P('model', None)),
    (r'.*quantize_group_\d+/embedding$', P('model', None)),
)


def param_shardings(mesh: Mesh, params: Any,
                    rules: Sequence[Tuple[str, P]] = TP_RULES) -> Any:
    """Per-leaf NamedShardings: TP rules where they match, replicated else."""
    from flax.traverse_util import flatten_dict, unflatten_dict
    flat = flatten_dict(params, sep='/')
    out = {}
    for path, leaf in flat.items():
        spec = P()
        for pattern, candidate in rules:
            if re.match(pattern, path):
                # only shard if the dimension divides the axis size
                axis_sizes = mesh.shape
                ok = True
                for dim, axis in enumerate(candidate):
                    if axis is None:
                        continue
                    if leaf.shape[dim] % axis_sizes[axis] != 0:
                        ok = False
                if ok:
                    spec = candidate
                break
        out[path] = NamedSharding(mesh, spec)
    return unflatten_dict(out, sep='/')


def shard_params(mesh: Mesh, params: Any, tensor_parallel: bool = False) -> Any:
    """Place a param pytree on the mesh (TP layout or fully replicated)."""
    if tensor_parallel and mesh.shape.get('model', 1) > 1:
        shardings = param_shardings(mesh, params)
        return jax.tree.map(jax.device_put, params, shardings)
    return jax.device_put(params, replicated(mesh))


def make_global_batch(mesh: Mesh, local_batch: Dict[str, np.ndarray]
                      ) -> Dict[str, Any]:
    """Host-local numpy batch -> globally-sharded device arrays.

    Single-process: device_put with batch sharding. Multi-process: each host
    contributes its shard (the loader already rank-partitions via
    EnlargedSampler), assembled with make_array_from_process_local_data.
    """
    sharding = batch_sharding(mesh)
    out = {}
    for k, v in local_batch.items():
        if not isinstance(v, np.ndarray):
            continue
        if jax.process_count() == 1:
            out[k] = jax.device_put(v, sharding)
        else:
            out[k] = jax.make_array_from_process_local_data(sharding, v)
    return out


def is_main_process() -> bool:
    """Rank gate (reference `master_only`, dist_util.py:74-82)."""
    return jax.process_index() == 0
