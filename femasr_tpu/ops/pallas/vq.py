"""Fused Pallas TPU kernel: codebook nearest-neighbor search (VQ argmin).

Replaces the reference's materialized cdist path
(/root/reference/basicsr/archs/femasr_arch.py:35-38,63-68): the reference
computes the full (N, n_e) distance matrix with cuBLAS then argmins it (plus
a one-hot scatter/matmul gather). For a 512px x4 tile that matrix is
(65536 x 1024) f32 = 268 MB of HBM traffic.

Kernel design (Mosaic-constraint-aware):
- grid over token tiles of TN=1024; the whole codebook tile (n_e, C) sits in
  VMEM (1024x512 f32 = 2 MB) so each token tile is swept in one MXU
  dot_general; ||z||^2 is row-constant and dropped.
- the int32 indices are emitted as (TN/128, 128) blocks — (8, 128)-aligned,
  since 1-wide or 1-D gridded outputs violate TPU tiling rules.
- codebooks larger than VMEM fall back to multi-pass over code chunks with a
  running (min, arg) pair carried in f32/int32 arrays outside the kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _vq_kernel(z_ref, cb_ref, val_ref, idx_ref, *, tn: int):
    z = z_ref[:]          # (TN, C)
    cb = cb_ref[:]        # (K, C)
    k = cb.shape[0]
    c2 = jnp.sum(cb.astype(jnp.float32) * cb.astype(jnp.float32), axis=1)
    d = c2[None, :] - 2.0 * jax.lax.dot_general(
        z, cb, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (TN, K)
    dmin = jnp.min(d, axis=1, keepdims=True)
    val_ref[:] = dmin.reshape(tn // LANES, LANES)
    # argmin WITHOUT an index-producing (variadic) reduction: Mosaic
    # crashed on jnp.argmin's (value, index) reduce at tn=1024 (HTTP 500,
    # tpu_compile_helper exit 1 — FORMULATIONS.md), while the int8 fc1
    # kernel's plain row-max + 1024-lane reduce COMPILE PASSes at the
    # same geometry. Two plain reduces reproduce argmin exactly: the
    # min distance, then the smallest lane index attaining it
    # (first-minimum tie-break, same as jnp/torch argmin).
    iota = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    masked = jnp.where(d <= dmin, iota, jnp.int32(k))
    idx_ref[:] = jnp.min(masked, axis=1).reshape(tn // LANES, LANES)


def _vq_argmin_chunk(z_flat: jax.Array, codebook: jax.Array, tn: int,
                     interpret: bool):
    """(min_dist, argmin) over one codebook chunk for all tokens."""
    n, c = z_flat.shape
    k = codebook.shape[0]
    grid = (n // tn,)
    val, idx = pl.pallas_call(
        functools.partial(_vq_kernel, tn=tn),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tn, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tn // LANES, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn // LANES, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n // LANES, LANES), jnp.float32),
            jax.ShapeDtypeStruct((n // LANES, LANES), jnp.int32),
        ),
        interpret=interpret,
    )(z_flat, codebook)
    return val.reshape(-1), idx.reshape(-1)


@functools.partial(jax.jit, static_argnames=('tn', 'max_codes_vmem',
                                             'interpret'))
def vq_argmin(z_flat: jax.Array, codebook: jax.Array, tn: int = 1024,
              max_codes_vmem: int = 2048, interpret: bool = False
              ) -> jax.Array:
    """argmin_j ||z_i - c_j||^2 without materializing the distance matrix.

    Args:
        z_flat: (N, C) tokens (f32 or bf16).
        codebook: (K, C) codebook.
        tn: token tile size (multiple of 128).
        max_codes_vmem: codebook rows held in VMEM per pass.
    Returns:
        (N,) int32 indices (first-minimum tie-breaking, like jnp/torch argmin).
    """
    n, c = z_flat.shape
    k = codebook.shape[0]
    tn = min(tn, max(LANES, ((n + LANES - 1) // LANES) * LANES))

    n_pad = (-n) % tn
    z_p = jnp.pad(z_flat, ((0, n_pad), (0, 0))) if n_pad else z_flat
    z_p = z_p.astype(jnp.float32)
    cb = codebook.astype(jnp.float32)

    if k <= max_codes_vmem:
        _, idx = _vq_argmin_chunk(z_p, cb, tn, interpret)
        return idx[:n]

    # large codebooks: sweep VMEM-sized chunks, keep a running (min, arg)
    best_val = jnp.full((z_p.shape[0],), jnp.inf, jnp.float32)
    best_idx = jnp.zeros((z_p.shape[0],), jnp.int32)
    for start in range(0, k, max_codes_vmem):
        chunk = cb[start:start + max_codes_vmem]
        val, idx = _vq_argmin_chunk(z_p, chunk, tn, interpret)
        better = val < best_val
        best_idx = jnp.where(better, idx + start, best_idx)
        best_val = jnp.where(better, val, best_val)
    return best_idx[:n]
