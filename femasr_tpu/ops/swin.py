"""Swin-transformer ops: window attention, (S)W-MSA blocks, RSTB, SwinLayers.

Capability parity with the reference's vendored SwinIR components
(/root/reference/basicsr/archs/network_swinir.py: window_partition:33,
WindowAttention:65, SwinTransformerBlock:164, BasicLayer:349, RSTB:419,
SwinLayers in femasr_arch.py:114-132).

TPU-first design:
- NHWC feature maps end-to-end; window partition is reshape+transpose (free
  on TPU — XLA folds it into the surrounding ops), never gather.
- Shapes are static under jit, so the shifted-window attention mask and the
  relative-position index are computed in **numpy at trace time** and baked
  into the program as constants (the reference recomputes torch masks on
  device per input size).
- Attention logits/softmax accumulate in float32; matmuls hit the MXU in the
  configured compute dtype (bfloat16 for production).
"""

from __future__ import annotations

import functools
import os
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


# ---------------------------------------------------------------------------
# static (trace-time) helpers
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def relative_position_index(wh: int, ww: int) -> np.ndarray:
    """Pairwise relative-position index inside a (wh, ww) window.

    Parity: network_swinir.py:92-103. Returns (wh*ww, wh*ww) int32.
    """
    coords_h = np.arange(wh)
    coords_w = np.arange(ww)
    coords = np.stack(np.meshgrid(coords_h, coords_w, indexing='ij'))  # 2, wh, ww
    coords_flatten = coords.reshape(2, -1)
    rel = coords_flatten[:, :, None] - coords_flatten[:, None, :]  # 2, N, N
    rel = rel.transpose(1, 2, 0).copy()
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    return rel.sum(-1).astype(np.int32)


@functools.lru_cache(maxsize=None)
def shifted_window_mask(h: int, w: int, window_size: int,
                        shift_size: int) -> np.ndarray:
    """0/-100 additive attention mask for SW-MSA, computed statically.

    Parity: network_swinir.py:216-237. Returns (nW, N, N) float32.
    """
    img_mask = np.zeros((h, w), dtype=np.int32)
    h_slices = (slice(0, -window_size), slice(-window_size, -shift_size),
                slice(-shift_size, None))
    w_slices = (slice(0, -window_size), slice(-window_size, -shift_size),
                slice(-shift_size, None))
    cnt = 0
    for hs in h_slices:
        for ws in w_slices:
            img_mask[hs, ws] = cnt
            cnt += 1
    mask = img_mask.reshape(h // window_size, window_size,
                            w // window_size, window_size)
    mask = mask.transpose(0, 2, 1, 3).reshape(-1, window_size * window_size)
    attn_mask = mask[:, None, :] - mask[:, :, None]
    return np.where(attn_mask != 0, -100.0, 0.0).astype(np.float32)


@functools.lru_cache(maxsize=None)
def shift_window_permutation(h: int, w: int, window_size: int,
                             shift_size: int) -> Tuple[np.ndarray, np.ndarray]:
    """Token permutation mapping the unshifted window partition of x onto
    the window partition of roll(x, (-shift, -shift)).

    Lets SW-MSA run on a window-major (B*nW, N, C) tensor without ever
    materializing the spatial layout: one static row gather replaces the
    roll + window_partition copies (and its inverse replaces
    window_reverse + roll-back). Trace-time numpy, baked as a constant —
    same policy as shifted_window_mask. Returns (perm, inv) int32 of
    shape (H*W,): y_win.reshape(-1, C)[j] = x_win.reshape(-1, C)[perm[j]].
    """
    idx = np.arange(h * w).reshape(h, w)

    def part(a: np.ndarray) -> np.ndarray:
        return (a.reshape(h // window_size, window_size,
                          w // window_size, window_size)
                .transpose(0, 2, 1, 3).reshape(-1))

    part0 = part(idx)
    inv0 = np.empty_like(part0)
    inv0[part0] = np.arange(part0.size)
    perm = inv0[part(np.roll(idx, (-shift_size, -shift_size), (0, 1)))]
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size)
    return perm.astype(np.int32), inv.astype(np.int32)


def window_partition(x: jax.Array, window_size: int) -> jax.Array:
    """(B, H, W, C) -> (B*nW, ws*ws, C)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // window_size, window_size, w // window_size,
                  window_size, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, window_size * window_size, c)


def window_reverse(windows: jax.Array, window_size: int, h: int,
                   w: int) -> jax.Array:
    """(B*nW, ws*ws, C) -> (B, H, W, C)."""
    c = windows.shape[-1]
    b = windows.shape[0] // (h * w // window_size // window_size)
    x = windows.reshape(b, h // window_size, w // window_size, window_size,
                        window_size, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


# ---------------------------------------------------------------------------
# modules
# ---------------------------------------------------------------------------

class LayerNormTPU(nn.Module):
    """LayerNorm over the last axis with float32 statistics, formulated
    for minimal HBM traffic on TPU.

    Drop-in for nn.LayerNorm(epsilon, dtype, param_dtype=f32): same param
    names/shapes ('scale', 'bias'), same math. flax's implementation
    materializes the float32 cast of its input before the moment reduces
    (measured 2026-08-17 on the 512px serving program: ~0.4 GB of
    copy/cast churn per LN at the swin resolution — the largest single
    byte sink after GroupNorm). Here the raw moments stream straight from
    the compute-dtype tensor as sibling lane reductions (the convert and
    square fuse into the reduce; same structure as the 'chanraw'
    GroupNorm in ops/layers.py), and the affine apply runs in the
    compute dtype.
    """
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        import os
        if os.environ.get('FEMASR_LN_IMPL') == 'flax':  # byte-A/B baseline
            return nn.LayerNorm(epsilon=self.epsilon, dtype=self.dtype,
                                param_dtype=jnp.float32, name='flaxln')(x)
        c = x.shape[-1]
        scale = self.param('scale', nn.initializers.ones, (c,), jnp.float32)
        bias = self.param('bias', nn.initializers.zeros, (c,), jnp.float32)
        xf = x.astype(jnp.float32)
        m1 = xf.mean(axis=-1, keepdims=True)
        m2 = jnp.square(xf).mean(axis=-1, keepdims=True)
        var = jnp.maximum(m2 - jnp.square(m1), 0.0)
        inv = jax.lax.rsqrt(var + self.epsilon)
        mul = (inv * scale).astype(self.dtype)
        sub = m1.astype(self.dtype)
        return (x.astype(self.dtype) - sub) * mul + bias.astype(self.dtype)


def dense(features: int, use_bias: bool = True, dtype: Dtype = jnp.float32,
          int8: bool = False, name: Optional[str] = None) -> nn.Module:
    if int8:
        from .layers import DenseInt8
        return DenseInt8(features, use_bias=use_bias, dtype=dtype, name=name)
    return nn.Dense(features, use_bias=use_bias, dtype=dtype,
                    param_dtype=jnp.float32, name=name)


class _QKV3(nn.Module):
    """Three-separate-dot qkv projection (`FEMASR_QKV=3mm` A/B point).

    Same `qkv/{kernel,bias}` param tree as ``nn.Dense(3C)`` (checkpoint-
    compatible), but q/k/v come from three dots on trace-time column
    slices of the packed KERNEL — the packed (B_, N, 3C) activation and
    its (B_, N, 3, nh, hd) reshape never exist, so XLA's layout
    assignment has no packed tensor to relay out between the projection
    fusion and the two attention dots (the 0.2 GB/block materialized
    `copy` flagged by `scripts/hlo_bytes.py --opcode copy`, 2026-08-20:
    ~4.7 GB of the 97.3 GB 512px program). Weight slices cost ~0.5 MB
    each per block — noise. Distinct from the removed FEMASR_QKV=slice
    loser, which sliced the packed ACTIVATION (three strided column
    reads of a 100 MB tensor each materialized, +8 GB).

    MEASURED (compile-only byte probe, 2026-08-20, bench_evidence/
    copy_attrib_512_qkv3mm_r4.txt): the attn relayout copies do
    disappear, but total program bytes REGRESS 97.29 → 98.88 GB and
    copy traffic stays flat (12.94 vs 12.91 GB) — f32 `norm1` moment
    copies (~0.14 GB/block) materialize instead once the LN output
    feeds three dots. Archived loser; see FORMULATIONS.md."""
    features: int            # 3C, matching nn.Dense(features)
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, ...]:
        c = self.features // 3
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (x.shape[-1], self.features), jnp.float32)
        bias = (self.param('bias', nn.initializers.zeros,
                           (self.features,), jnp.float32)
                if self.use_bias else None)
        xd = x.astype(self.dtype)
        kd = kernel.astype(self.dtype)
        outs = []
        for i in range(3):
            o = xd @ kd[:, i * c:(i + 1) * c]
            if bias is not None:
                o = o + bias[i * c:(i + 1) * c].astype(self.dtype)
            outs.append(o)
        return tuple(outs)


class Mlp(nn.Module):
    """fc1 -> GELU(exact) -> fc2 (network_swinir.py:14-30; dropout rate 0)."""
    hidden_features: int
    out_features: int
    int8: bool = False
    # per-token int8 chain (explicit, via FeMaSRNet(int8_mlp=True)); the
    # FEMASR_INT8_CHAIN=1 env upgrades any int8 Mlp to the chain form for
    # A/Bs against the per-tensor int8_swin configs
    chain: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.chain or (self.int8 and
                          os.environ.get('FEMASR_INT8_CHAIN') == '1'):
            # per-token int8 chain (NOTES_ROUND4.md): quantize_rows is
            # row-local (fuses into the LayerNorm producer), fc1 emits
            # int8 + row scales from its epilogue (GELU fused, in f32 —
            # at or above the plain path's bf16 accuracy), fc2 consumes
            # int8 directly. The 4x-wide intermediate crosses HBM once
            # at int8 width instead of bf16-out + whole-tensor scale
            # pass + quantize round-trip. Param names/shapes identical.
            from .layers import DenseInt8, quantize_rows
            h = DenseInt8(self.hidden_features, dtype=self.dtype,
                          name='fc1')(quantize_rows(x), act='gelu',
                                      out_int8=True)
            return DenseInt8(self.out_features, dtype=self.dtype,
                             name='fc2')(h)
        x = dense(self.hidden_features, dtype=self.dtype, int8=self.int8,
                  name='fc1')(x)
        # f32 models: exact erf GELU (torch nn.GELU default — reference
        # semantics). Reduced precision: tanh approximation — its ~1e-3
        # relative error sits below bf16's own 4e-3 rounding, and the erf
        # polynomial alone costs ~0.9 ms/block at 256px (measured).
        x = nn.gelu(x, approximate=self.dtype != jnp.float32)
        x = dense(self.out_features, dtype=self.dtype, int8=self.int8,
                  name='fc2')(x)
        return x


class WindowAttention(nn.Module):
    """W-MSA with learned relative position bias (network_swinir.py:65-145)."""
    dim: int
    window_size: Tuple[int, int]
    num_heads: int
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    # 'xla' (default) or 'pallas' — the fused VMEM-resident kernel
    # (ops/pallas/window_attention.py); pallas measured -40% wall-clock
    # at this geometry (FORMULATIONS.md), keep opt-in (same policy as
    # vq_backend). The 'nhwc' and window-packing formulations were
    # DELETED round 5 after measuring 222.6 / 114.9-125.8 GB program
    # bytes vs 97.3 baseline (FORMULATIONS.md archived rows).
    backend: str = 'xla'
    # w8a8 int8 qkv/proj linears (serving-only; attention einsums and
    # softmax stay in the float dtype — see FeMaSRNet.int8_swin)
    int8_linears: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[np.ndarray] = None
                 ) -> jax.Array:
        """x: (B_, N, C) windows; mask: static (nW, N, N) or None."""
        b_, n, c = x.shape
        nh = self.num_heads
        head_dim = c // nh
        scale = self.qk_scale or head_dim ** -0.5

        table = self.param(
            'relative_position_bias_table',
            nn.initializers.truncated_normal(stddev=0.02),
            ((2 * self.window_size[0] - 1) * (2 * self.window_size[1] - 1), nh),
            jnp.float32)

        use_3mm = (os.environ.get('FEMASR_QKV') == '3mm'
                   and not self.int8_linears and self.backend != 'pallas')
        if use_3mm:
            ql, kl, vl = _QKV3(c * 3, use_bias=self.qkv_bias,
                               dtype=self.dtype, name='qkv')(x)
        else:
            qkv = dense(c * 3, use_bias=self.qkv_bias, dtype=self.dtype,
                        int8=self.int8_linears, name='qkv')(x)

        rpi_flat = relative_position_index(*self.window_size).reshape(-1)

        if self.backend == 'pallas':
            from .pallas.window_attention import window_attention_fused
            q = qkv[..., :c] * scale
            k = qkv[..., c:2 * c]
            v = qkv[..., 2 * c:]
            bias_p = table[rpi_flat].reshape(n, n, nh).transpose(2, 0, 1)
            mask_p = None
            if mask is not None:
                nw = mask.shape[0]
                mask_p = jnp.tile(jnp.asarray(mask, dtype=self.dtype),
                                  (b_ // nw, 1, 1))
            tw = next(t for t in (16, 8, 4, 2, 1) if b_ % t == 0)
            out = window_attention_fused(q, k, v, bias_p, mask_p,
                                         num_heads=nh, tw=tw)
            return dense(c, dtype=self.dtype, int8=self.int8_linears,
                         name='proj')(out)

        # q/k/v head split: one contiguous (B_, N, 3, nh, hd) reshape and
        # unstack — measured 97.3 GB full-program traffic. The minor-dim
        # slice formulation (FEMASR_QKV=slice) measured an +8 GB REGRESSION
        # (the three strided column slices each materialized where the
        # single reshape fused) and was removed; FEMASR_QKV=3mm (weight-
        # slice, three dots — see _QKV3) is the live A/B against the
        # packed tensor's per-block relayout copy. See FORMULATIONS.md.
        if use_3mm:
            q = ql.reshape(b_, n, nh, head_dim) * scale
            k = kl.reshape(b_, n, nh, head_dim)
            v = vl.reshape(b_, n, nh, head_dim)
        else:
            qkv = qkv.reshape(b_, n, 3, nh, head_dim)
            q = qkv[:, :, 0] * scale   # (B_, N, nh, hd)
            k = qkv[:, :, 1]
            v = qkv[:, :, 2]

        pn, g = n, b_

        # In float32 models the attention tensor is exact reference
        # semantics (f32 logits + f32 softmax). In reduced-precision models
        # the (B_*nh, N, N) logits tensor is stored in the compute dtype —
        # it is the single largest tensor in the block (134 MB f32 at 256px)
        # and storing it bf16 halves the attention unit's wall time; the MXU
        # still accumulates the q.k products in f32 internally, and the
        # softmax normalizer is accumulated in f32 below.
        acc_dtype = (jnp.float32 if self.dtype == jnp.float32 else self.dtype)
        attn = jnp.einsum('bnhd,bmhd->bhnm', q, k,
                          preferred_element_type=acc_dtype)

        bias = table[rpi_flat].reshape(n, n, nh).transpose(2, 0, 1)  # (nh, N, N)
        attn = attn + bias[None].astype(acc_dtype)

        if mask is not None:
            mask_np = np.asarray(mask, dtype=np.float32)
            nwg = mask_np.shape[0]
            mask_c = jnp.asarray(mask_np, dtype=acc_dtype)
            attn = (attn.reshape(g // nwg, nwg, nh, pn, pn)
                    + mask_c[None, :, None])
            attn = attn.reshape(g, nh, pn, pn)

        if acc_dtype == jnp.float32:
            attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        else:
            # numerically-guarded low-precision softmax: max-shift and a
            # float32-accumulated normalizer, storage stays in acc_dtype
            attn_max = jax.lax.stop_gradient(
                jnp.max(attn, axis=-1, keepdims=True))
            e = jnp.exp(attn - attn_max)
            s = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
            attn = e / s.astype(acc_dtype)
        out = jnp.einsum('bhnm,bmhd->bnhd', attn, v).reshape(b_, n, c)
        return dense(c, dtype=self.dtype, int8=self.int8_linears,
                     name='proj')(out)


class SwinTransformerBlock(nn.Module):
    """LN -> (S)W-MSA -> residual -> LN -> MLP -> residual.

    Parity: network_swinir.py:164-279. `input_resolution` is the *nominal*
    resolution used only for the window-size clamp (the actual (H, W) comes
    in at call time and is static under jit).
    """
    dim: int
    input_resolution: Tuple[int, int]
    num_heads: int
    window_size: int = 7
    shift_size: int = 0
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    attn_backend: str = 'xla'
    int8_linears: bool = False
    # per-token int8 chain for the MLP only (FEMASR_INT8_CHAIN=1) — the
    # candidate that does NOT pull qkv/proj into the per-tensor int8 path
    int8_mlp: bool = False
    dtype: Dtype = jnp.float32

    def _clamped(self) -> Tuple[int, int]:
        window_size = self.window_size
        shift_size = self.shift_size
        if min(self.input_resolution) <= window_size:
            shift_size = 0
            window_size = min(self.input_resolution)
        return window_size, shift_size

    @nn.compact
    def __call__(self, x: jax.Array,
                 hw: Optional[Tuple[int, int]] = None) -> jax.Array:
        """x: (B, H, W, C) spatial — or (B*nW, N, C) window-major when `hw`
        (the static spatial resolution) is given; see BasicLayer."""
        window_size, shift_size = self._clamped()
        if hw is not None:
            return self._winmajor(x, hw, window_size, shift_size)
        b, h, w, c = x.shape

        shortcut = x
        x = LayerNormTPU(epsilon=1e-5, dtype=self.dtype, name='norm1')(x)

        if shift_size > 0:
            x = jnp.roll(x, (-shift_size, -shift_size), axis=(1, 2))

        mask = (shifted_window_mask(h, w, window_size, shift_size)
                if shift_size > 0 else None)
        backend = os.environ.get('FEMASR_ATTN', self.attn_backend)
        attn_mod = WindowAttention(
            dim=self.dim, window_size=(window_size, window_size),
            num_heads=self.num_heads, qkv_bias=self.qkv_bias,
            qk_scale=self.qk_scale, backend=backend,
            int8_linears=self.int8_linears,
            dtype=self.dtype, name='attn')
        x_windows = window_partition(x, window_size)
        attn_windows = attn_mod(x_windows, mask=mask)
        x = window_reverse(attn_windows, window_size, h, w)

        if shift_size > 0:
            x = jnp.roll(x, (shift_size, shift_size), axis=(1, 2))

        x = shortcut + x
        y = LayerNormTPU(epsilon=1e-5, dtype=self.dtype, name='norm2')(x)
        y = Mlp(hidden_features=int(self.dim * self.mlp_ratio),
                out_features=self.dim,
                int8=self.int8_linears or self.int8_mlp,
                chain=self.int8_mlp,
                dtype=self.dtype, name='mlp')(y)
        return x + y

    def _winmajor(self, x: jax.Array, hw: Tuple[int, int],
                  window_size: int, shift_size: int) -> jax.Array:
        """Window-major block body: x stays (B*nW, N, C) end-to-end.

        The residual stream never round-trips through the spatial layout
        (LN / MLP / residual adds are per-token, so they commute with the
        partition); the SW-MSA cyclic shift becomes a static row gather
        (shift_window_permutation) instead of roll + partition + reverse +
        roll-back. Bit-identical math to the spatial path — same submodule
        names, so the param tree is unchanged. Motivation: the 2026-08-17
        per-op HLO attribution showed ~0.77 GB/block of layout staging
        copies around the partition boundaries on the 512px serving
        program (18.4 GB of its 97.9 GB total).
        """
        h, w = hw
        b_, n, c = x.shape
        nw = (h // window_size) * (w // window_size)
        b = b_ // nw

        shortcut = x
        y = LayerNormTPU(epsilon=1e-5, dtype=self.dtype, name='norm1')(x)

        if shift_size > 0:
            perm, inv = shift_window_permutation(h, w, window_size,
                                                 shift_size)
            y = jnp.take(y.reshape(b, nw * n, c), jnp.asarray(perm),
                         axis=1).reshape(b_, n, c)

        mask = (shifted_window_mask(h, w, window_size, shift_size)
                if shift_size > 0 else None)
        y = WindowAttention(
            dim=self.dim, window_size=(window_size, window_size),
            num_heads=self.num_heads, qkv_bias=self.qkv_bias,
            qk_scale=self.qk_scale, backend='xla',
            int8_linears=self.int8_linears,
            dtype=self.dtype, name='attn')(y, mask=mask)

        if shift_size > 0:
            y = jnp.take(y.reshape(b, nw * n, c), jnp.asarray(inv),
                         axis=1).reshape(b_, n, c)

        x = shortcut + y
        y = LayerNormTPU(epsilon=1e-5, dtype=self.dtype, name='norm2')(x)
        y = Mlp(hidden_features=int(self.dim * self.mlp_ratio),
                out_features=self.dim,
                int8=self.int8_linears or self.int8_mlp,
                chain=self.int8_mlp,
                dtype=self.dtype, name='mlp')(y)
        return x + y


class BasicLayer(nn.Module):
    """depth x SwinTransformerBlock with alternating shift 0 / ws//2.

    Parity: network_swinir.py:349-405.
    """
    dim: int
    input_resolution: Tuple[int, int]
    depth: int
    num_heads: int
    window_size: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    use_checkpoint: bool = False
    attn_backend: str = 'xla'
    # 'spatial': each block round-trips (B,H,W,C) <-> windows.
    # 'winmajor': partition once, run every block window-major (shifts as
    # static row gathers), reverse once before the RSTB conv. Bit-exact;
    # selectable via FEMASR_SWIN_LAYOUT for byte A/Bs.
    attn_layout: str = 'spatial'
    int8_linears: bool = False
    int8_mlp: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # use_checkpoint -> jax.checkpoint (rematerialization): trade FLOPs
        # for HBM, the TPU analogue of torch.utils.checkpoint.
        layout = os.environ.get('FEMASR_SWIN_LAYOUT', self.attn_layout)
        backend = os.environ.get('FEMASR_ATTN', self.attn_backend)
        winmajor = layout == 'winmajor'
        block_cls = (nn.remat(SwinTransformerBlock,
                              static_argnums=(2,) if winmajor else ())
                     if self.use_checkpoint else SwinTransformerBlock)
        b, h, w, c = x.shape
        if winmajor:
            # the per-block window clamp is resolution-static — compute it
            # once here so partition/reverse use the effective size
            ws = (min(self.input_resolution)
                  if min(self.input_resolution) <= self.window_size
                  else self.window_size)
            x = window_partition(x, ws)
        for i in range(self.depth):
            blk = block_cls(
                dim=self.dim, input_resolution=self.input_resolution,
                num_heads=self.num_heads, window_size=self.window_size,
                shift_size=0 if (i % 2 == 0) else self.window_size // 2,
                mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                qk_scale=self.qk_scale, attn_backend=self.attn_backend,
                int8_linears=self.int8_linears,
                int8_mlp=self.int8_mlp,
                dtype=self.dtype, name=f'blocks_{i}')
            x = blk(x, (h, w)) if winmajor else blk(x)
        if winmajor:
            x = window_reverse(x, ws, h, w)
        return x


class RSTB(nn.Module):
    """Residual Swin Transformer Block: BasicLayer -> conv3x3 -> +residual.

    Parity: network_swinir.py:419-482 (resi_connection='1conv').
    Operates on NHWC maps directly (the reference round-trips through token
    sequences via PatchEmbed/PatchUnEmbed; on TPU that is a no-op reshape).
    """
    dim: int
    input_resolution: Tuple[int, int]
    depth: int
    num_heads: int
    window_size: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    use_checkpoint: bool = False
    attn_backend: str = 'xla'
    attn_layout: str = 'spatial'
    int8_linears: bool = False
    int8_mlp: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = BasicLayer(dim=self.dim, input_resolution=self.input_resolution,
                       depth=self.depth, num_heads=self.num_heads,
                       window_size=self.window_size, mlp_ratio=self.mlp_ratio,
                       qkv_bias=self.qkv_bias, qk_scale=self.qk_scale,
                       use_checkpoint=self.use_checkpoint,
                       attn_backend=self.attn_backend,
                       attn_layout=self.attn_layout,
                       int8_linears=self.int8_linears,
                       int8_mlp=self.int8_mlp,
                       dtype=self.dtype,
                       name='residual_group')(x)
        y = nn.Conv(self.dim, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, param_dtype=jnp.float32, name='conv')(y)
        return y + x


class SwinLayers(nn.Module):
    """4x RSTB at the deepest LQ-encoder resolution (femasr_arch.py:114-132)."""
    input_resolution: Tuple[int, int] = (32, 32)
    embed_dim: int = 256
    blk_depth: int = 6
    num_heads: int = 8
    window_size: int = 8
    mlp_ratio: float = 4.0
    use_checkpoint: bool = False
    attn_backend: str = 'xla'
    attn_layout: str = 'spatial'
    # w8a8 int8 qkv/proj/fc1/fc2 linears (~96% of swin FLOPs; the v5e
    # int8 MXU path peaks at 2x bf16). Serving-only, checkpoint-free.
    # NOTE: swin feeds the quantizer, so int8 here can flip near-tie
    # codebook indices — same divergence class as bf16 serving
    # (PARITY.md); gate via tests/test_inference.py int8 quality test.
    int8_linears: bool = False
    int8_mlp: bool = False
    # probe-only: run just the first num_groups RSTB groups (param names
    # unchanged — serve_prefix_probe.py intra-encoder attribution)
    num_groups: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i in range(self.num_groups):
            x = RSTB(dim=self.embed_dim,
                     input_resolution=tuple(self.input_resolution),
                     depth=self.blk_depth, num_heads=self.num_heads,
                     window_size=self.window_size, mlp_ratio=self.mlp_ratio,
                     use_checkpoint=self.use_checkpoint,
                     attn_backend=self.attn_backend,
                     attn_layout=self.attn_layout,
                     int8_linears=self.int8_linears,
                     int8_mlp=self.int8_mlp,
                     dtype=self.dtype,
                     name=f'swin_blks_{i}')(x)
        return x
