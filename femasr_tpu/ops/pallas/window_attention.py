"""Fused Pallas TPU kernel: windowed multi-head self-attention.

Replaces the XLA path's weakest link in the Swin blocks
(/root/reference/basicsr/archs/network_swinir.py:114-145): with window
size 8 the attention math is 8192 tiny (64x32)@(32x64) matmuls per block —
XLA's batched-dot lowering reaches only ~6 TFLOP/s on them and the f32
logits tensor (B_*nh, 64, 64) round-trips HBM between matmul, bias/mask
adds and softmax. This kernel keeps a tile of windows' q/k/v in VMEM,
loops the 8 heads with f32 logits in registers/VMEM scratch, fuses the
relative-position bias + shift mask + softmax, and writes only the final
(TW, N, C) output — one HBM pass over q/k/v/out total.

Grid: one step per window tile (TW windows). Per step VMEM:
q/k/v/out 4 x TW*64*256*2B (= 1 MB at TW=16) + f32 logits scratch
TW*64*64*4B (256 KB) + bias (8, 64, 64) f32 + mask tile — well under 16 MB.

Unvalidated on this harness's relay (tpu_custom_call stalls its remote
compile helper — NOTES_ROUND2.md); interpret-mode parity + Mosaic lowering
are tested in tests/test_pallas_window_attention.py. Off by default.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _wattn_kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, out_ref, *,
                  num_heads: int, head_dim: int, with_mask: bool):
    n = q_ref.shape[1]
    tw = q_ref.shape[0]
    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        q = q_ref[:, :, sl]                      # (TW, N, hd)
        k = k_ref[:, :, sl]
        v = v_ref[:, :, sl]
        logits = jax.lax.dot_general(             # (TW, N, N) f32
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        logits = logits + bias_ref[h][None].astype(jnp.float32)
        if with_mask:
            logits = logits + mask_ref[:].astype(jnp.float32)
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v.dtype)
        out = jax.lax.dot_general(                # (TW, N, hd)
            p, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)   # Mosaic: 32-bit acc
        out_ref[:, :, sl] = out.astype(out_ref.dtype)
    del n, tw


def window_attention_fused(q: jax.Array, k: jax.Array, v: jax.Array,
                           bias: jax.Array,
                           mask: Optional[jax.Array] = None,
                           num_heads: int = 8, tw: int = 16,
                           interpret: bool = False) -> jax.Array:
    """softmax(q kᵀ + bias [+ mask]) v over windows, fused in VMEM.

    Args:
        q, k, v: (B_, N, C) per-window tokens (q pre-scaled by 1/sqrt(hd)).
        bias: (nh, N, N) relative-position bias (f32).
        mask: optional (B_, N, N) additive shift mask, already broadcast to
            windows (0 for interior windows).
        num_heads: head count; head_dim = C // num_heads.
        tw: windows per grid step (B_ must be divisible; pad upstream).
    Returns:
        (B_, N, C) attention output in q.dtype.
    """
    b_, n, c = q.shape
    assert b_ % tw == 0, (b_, tw)
    head_dim = c // num_heads
    grid = (b_ // tw,)

    token_spec = pl.BlockSpec((tw, n, c), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((num_heads, n, n), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    with_mask = mask is not None
    in_specs = [token_spec, token_spec, token_spec, bias_spec]
    operands = [q, k, v, bias]
    if with_mask:
        in_specs.append(pl.BlockSpec((tw, n, n), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(mask)
    else:
        # dummy scalar-shaped placeholder keeps the kernel signature static
        in_specs.append(pl.BlockSpec((1, n, n), lambda i: (0, 0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(jnp.zeros((1, n, n), q.dtype))

    return pl.pallas_call(
        functools.partial(_wattn_kernel, num_heads=num_heads,
                          head_dim=head_dim, with_mask=with_mask),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tw, n, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_, n, c), q.dtype),
        interpret=interpret,
    )(*operands)
