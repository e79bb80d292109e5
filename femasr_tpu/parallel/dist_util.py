"""Distributed runtime helpers (reference dist_util surface over JAX).

Parity: /root/reference/basicsr/utils/dist_util.py (init_dist:10-57,
get_dist_info:60-71, master_only:74-82). NCCL process groups are replaced by
the JAX distributed runtime: one process per host, devices discovered by the
runtime, collectives inserted by XLA under jit.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple


def init_dist(launcher: str = 'jax', backend: Optional[str] = None,
              **kwargs) -> None:
    """Initialize multi-host JAX.

    launcher:
        'jax'   — explicit coordinator via kwargs or JAX_COORDINATOR_ADDRESS.
        'slurm' — derive coordinator/process ids from SLURM_* env vars.
        'none'  — single process (no-op).
    """
    import jax
    if launcher == 'none':
        return
    if launcher == 'slurm':
        proc_id = int(os.environ['SLURM_PROCID'])
        ntasks = int(os.environ['SLURM_NTASKS'])
        node_list = os.environ['SLURM_NODELIST']
        addr = node_list.split(',')[0].replace('[', '').split('-')[0]
        port = kwargs.get('port', 29500)
        jax.distributed.initialize(
            coordinator_address=f'{addr}:{port}',
            num_processes=ntasks, process_id=proc_id)
        return
    if launcher == 'jax':
        try:
            jax.distributed.initialize(**kwargs)
        except Exception:
            pass  # single-process fallback / already initialized
        return
    raise ValueError(f'Invalid launcher type: {launcher}')


def get_dist_info() -> Tuple[int, int]:
    """(rank, world_size) — reference dist_util.py:60-71."""
    import jax
    return jax.process_index(), jax.process_count()


def master_only(func):
    """Decorator: run only on process 0 (reference dist_util.py:74-82)."""

    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        rank, _ = get_dist_info()
        if rank == 0:
            return func(*args, **kwargs)

    return wrapper
