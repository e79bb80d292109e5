"""Fused Pallas TPU kernel: codebook nearest-neighbor search (VQ argmin).

Replaces the reference's materialized cdist path
(/root/reference/basicsr/archs/femasr_arch.py:35-38,63-68): the reference
computes the full (N, n_e) distance matrix with cuBLAS then argmins it (plus a
one-hot scatter/matmul gather). For a 512px x4 tile that matrix is
(65536 x 1024) f32 = 268 MB of HBM traffic.

This kernel tiles tokens x codes on-chip: each (TN, C) token tile is loaded
to VMEM once, swept against (TK, C) codebook tiles on the MXU
(d = ||c||^2 - 2 z.c; the ||z||^2 term is constant per row and dropped), and
a running (min, argmin) pair lives in VMEM scratch — the distance matrix
never touches HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _vq_argmin_kernel(z_ref, cb_ref, out_ref, minval, minidx, *, tk: int):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        minval[:] = jnp.full(minval.shape, jnp.inf, minval.dtype)
        minidx[:] = jnp.zeros(minidx.shape, minidx.dtype)

    z = z_ref[:]          # (TN, C)
    cb = cb_ref[:]        # (TK, C)
    c2 = jnp.sum(cb.astype(jnp.float32) * cb.astype(jnp.float32), axis=1)
    d = c2[None, :] - 2.0 * jax.lax.dot_general(
        z, cb, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (TN, TK)

    local_min = jnp.min(d, axis=1, keepdims=True)
    local_arg = (jnp.argmin(d, axis=1).astype(jnp.int32)[:, None]
                 + j * tk)
    better = local_min < minval[:]
    minidx[:] = jnp.where(better, local_arg, minidx[:])
    minval[:] = jnp.where(better, local_min, minval[:])

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        out_ref[:] = minidx[:]


@functools.partial(jax.jit, static_argnames=('tn', 'tk', 'interpret'))
def vq_argmin(z_flat: jax.Array, codebook: jax.Array, tn: int = 256,
              tk: int = 256, interpret: bool = False) -> jax.Array:
    """argmin_j ||z_i - c_j||^2 without materializing the distance matrix.

    Args:
        z_flat: (N, C) tokens (f32 or bf16).
        codebook: (K, C) codebook.
        tn, tk: token / code tile sizes (MXU-aligned).
    Returns:
        (N,) int32 indices (first-minimum tie-breaking, like jnp/torch argmin).
    """
    n, c = z_flat.shape
    k = codebook.shape[0]
    tn = min(tn, max(8, n))
    tk = min(tk, k)

    n_pad = (-n) % tn
    k_pad = (-k) % tk
    z_p = jnp.pad(z_flat, ((0, n_pad), (0, 0))) if n_pad else z_flat
    cb_p = codebook
    if k_pad:
        # padded codes sit at +inf distance via a large-norm sentinel
        cb_p = jnp.pad(codebook, ((0, k_pad), (0, 0)),
                       constant_values=3e18)

    grid = (z_p.shape[0] // tn, cb_p.shape[0] // tk)
    out = pl.pallas_call(
        functools.partial(_vq_argmin_kernel, tk=tk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tn, c), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, c), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tn, 1), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((z_p.shape[0], 1), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((tn, 1), jnp.float32),
            pltpu.VMEM((tn, 1), jnp.int32),
        ],
        interpret=interpret,
    )(z_p, cb_p)
    return out[:n, 0]
