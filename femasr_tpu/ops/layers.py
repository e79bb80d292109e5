"""NHWC-native building-block layers (norm / act / resblock / combine).

Capability parity with /root/reference/basicsr/archs/fema_utils.py
(NormLayer:12, ActLayer:43, ResBlock:65, CombineQuantBlock:87), re-designed
for TPU: NHWC layout so convolutions map straight onto the MXU, float32
normalization statistics with a configurable (bfloat16) compute dtype, and
nearest-neighbor resizing expressed as reshape/broadcast (no gather).
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class GroupNorm(nn.Module):
    """GroupNorm over NHWC with float32 statistics.

    Matches torch.nn.GroupNorm(num_groups, C, eps, affine=True): channels are
    split into `num_groups` consecutive groups; mean/var are computed per
    (sample, group) over (H, W, C/groups).
    """
    num_groups: int = 32
    eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        assert c % self.num_groups == 0, f'channels {c} % groups {self.num_groups}'
        scale = self.param('scale', nn.initializers.ones, (c,), jnp.float32)
        bias = self.param('bias', nn.initializers.zeros, (c,), jnp.float32)

        b = x.shape[0]
        g = self.num_groups
        # statistics in f32 (bf16-safe), in as few passes over the
        # activation as XLA will fuse (decoder-tail activations reach
        # 0.5-1 GB — the stats pass IS the cost of this layer). A
        # per-group sampled shift centers the pass so E[d^2]-E[d]^2
        # cannot catastrophically cancel when |mean| >> std.
        #
        # The reduction STRUCTURE is surprisingly consequential on TPU.
        # Byte A/B on the full 512px serving program (v5e, compiled HLO
        # 'bytes accessed', 2026-08-17 — scripts/gn_ab_probe.py):
        #   grouped   171.6 GB — reshape the BF16 tensor to (B,HW,G,C/G)
        #             first, cast to f32 inside the reduce fusion. The
        #             f32-cast-first ordering costs +39 GB (210.8 GB):
        #             XLA materializes the cast and relayouts it at f32
        #             width (copy+slice+reshape chains, ~10 GB per tail
        #             norm in the per-op attribution).
        #   chanlast  195.4 GB — per-channel spatial means (no reshape of
        #             the big tensor) then fold (B,C) into groups; the
        #             shift subtraction materializes as a full f32 d.
        #   variadic lax.reduce of (d, d*d): catastrophic on chanlast
        #             (+110 GB — BOTH operands materialize); removed.
        #   chanraw   117.7 GB (DEFAULT) — chanlast without the shift:
        #             sibling reduces of x and x*x stream straight from
        #             the bf16 conv-layout tensor, nothing new
        #             materializes. 31% less full-program traffic than
        #             grouped; roofline 143.8 vs 209.6 ms (gn_ab2,
        #             2026-08-17). Batch-2: 436.8 vs 590.2 GB.
        # Equal counts per channel keep the mean-of-means forms exact.
        impl = os.environ.get('FEMASR_GN_IMPL', 'chanraw')
        if impl == 'chanraw':
            # raw per-channel moments, no shift: minimum-traffic form.
            # f32 accumulation over bf16 values; the E[x^2]-E[x]^2
            # subtraction can cancel when |mean| >> std (clamped below) —
            # the regime is not hit by post-conv activations in practice
            # (ADVICE.md round-2 rated it low), but 'grouped' remains the
            # cancellation-safe default until this wins on hardware.
            spatial_axes = tuple(range(1, x.ndim - 1))
            xf = x.astype(jnp.float32)
            m1 = xf.mean(axis=spatial_axes)                    # (B, C)
            m2 = jnp.square(xf).mean(axis=spatial_axes)        # (B, C)
            shift = jnp.zeros((b, g), jnp.float32)
            dmean = m1.reshape(b, g, c // g).mean(axis=-1)     # (B, G)
            dmean2 = m2.reshape(b, g, c // g).mean(axis=-1)    # (B, G)
        elif impl == 'chanlast':
            spatial_axes = tuple(range(1, x.ndim - 1))
            xf = x.astype(jnp.float32)
            shift = jax.lax.stop_gradient(
                xf.reshape(b, -1, c)[:, 0].reshape(b, g, c // g)[:, :, 0])
            shift_c = jnp.repeat(shift, c // g, axis=1)        # (B, C)
            d = xf - shift_c.reshape((b,) + (1,) * (x.ndim - 2) + (c,))
            m1 = d.mean(axis=spatial_axes)
            m2 = jnp.square(d).mean(axis=spatial_axes)
            dmean = m1.reshape(b, g, c // g).mean(axis=-1)     # (B, G)
            dmean2 = m2.reshape(b, g, c // g).mean(axis=-1)    # (B, G)
        else:  # grouped (default): reshape bf16 FIRST, cast inside reduce
            xg = x.reshape(b, -1, g, c // g)
            xf = xg.astype(jnp.float32)
            shift = jax.lax.stop_gradient(xf[:, 0, :, 0])      # (B, G)
            d = xf - shift[:, None, :, None]
            dmean = d.mean(axis=(1, 3))                        # (B, G)
            dmean2 = jnp.square(d).mean(axis=(1, 3))
        mean = shift + dmean
        var = jnp.maximum(dmean2 - jnp.square(dmean), 0.0)
        inv = jax.lax.rsqrt(var + self.eps)                # (B, G)
        mean_c = jnp.repeat(mean, c // g, axis=1)          # (B, C)
        inv_c = jnp.repeat(inv, c // g, axis=1)            # (B, C)
        shape = (b,) + (1,) * (x.ndim - 2) + (c,)
        mul = (inv_c.reshape(shape) * scale).astype(self.dtype)
        sub = mean_c.reshape(shape).astype(self.dtype)
        return (x.astype(self.dtype) - sub) * mul + bias.astype(self.dtype)


class InstanceNorm(nn.Module):
    """InstanceNorm2d(affine=False) parity: per-sample/channel over (H, W)."""
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        xf = x.astype(jnp.float32)
        mean = xf.mean(axis=(1, 2), keepdims=True)
        var = xf.var(axis=(1, 2), keepdims=True)
        return ((xf - mean) * jax.lax.rsqrt(var + self.eps)).astype(self.dtype)


class NormLayer(nn.Module):
    """Norm switch: bn / in / gn (32 groups, eps 1e-6) / none."""
    channels: int
    norm_type: str = 'gn'
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        nt = self.norm_type.lower()
        if nt == 'gn':
            return GroupNorm(num_groups=32, eps=1e-6, dtype=self.dtype, name='norm')(x)
        if nt == 'in':
            return InstanceNorm(dtype=self.dtype, name='norm')(x)
        if nt == 'bn':
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=self.dtype,
                                param_dtype=jnp.float32, name='norm')(x)
        if nt == 'none':
            return x
        raise ValueError(f'Norm type {self.norm_type} not supported.')


class ActLayer(nn.Module):
    """Activation switch: relu / leakyrelu(0.2) / prelu / silu / gelu / none."""
    channels: int
    act_type: str = 'leakyrelu'
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        at = self.act_type.lower()
        if at == 'relu':
            return nn.relu(x)
        if at == 'leakyrelu':
            return nn.leaky_relu(x, negative_slope=0.2)
        if at == 'prelu':
            alpha = self.param('alpha', nn.initializers.constant(0.25),
                               (self.channels,), jnp.float32)
            alpha = alpha.astype(x.dtype)
            return jnp.where(x >= 0, x, alpha * x)
        if at == 'silu':
            return nn.silu(x)
        if at == 'gelu':
            # torch nn.GELU() default is the exact (erf) formulation; in
            # reduced precision the tanh approximation (error ~1e-3, below
            # bf16 rounding) skips the costly erf polynomial (see ops/swin.py
            # Mlp for the measurement)
            return nn.gelu(x, approximate=self.dtype != jnp.float32)
        if at == 'none':
            return x
        raise ValueError(f'activation type {self.act_type} not supported.')


def conv2d(features: int, kernel: int, stride: int = 1, padding: int = 0,
           use_bias: bool = True, dtype: Dtype = jnp.float32,
           name: Optional[str] = None) -> nn.Conv:
    """NHWC Conv2d with torch-style symmetric integer padding."""
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding=((padding, padding), (padding, padding)),
                   use_bias=use_bias, dtype=dtype, param_dtype=jnp.float32,
                   name=name)


class ResBlock(nn.Module):
    """Pre-activation residual block: [Norm, Act, Conv3, Norm, Act, Conv3] + skip.

    Parity: fema_utils.py:65-84.
    """
    in_channel: int
    out_channel: int
    norm_type: str = 'gn'
    act_type: str = 'leakyrelu'
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        res = NormLayer(self.in_channel, self.norm_type, self.dtype, name='norm1')(x, train)
        res = ActLayer(self.in_channel, self.act_type, self.dtype, name='act1')(res)
        res = conv2d(self.out_channel, 3, 1, 1, dtype=self.dtype, name='conv1')(res)
        res = NormLayer(self.out_channel, self.norm_type, self.dtype, name='norm2')(res, train)
        res = ActLayer(self.out_channel, self.act_type, self.dtype, name='act2')(res)
        res = conv2d(self.out_channel, 3, 1, 1, dtype=self.dtype, name='conv2')(res)
        return res + x


def upsample_nearest(x: jax.Array, factor: int = 2) -> jax.Array:
    """Nearest-neighbor x{factor} upsample via broadcast (TPU-friendly, no gather)."""
    b, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (b, h, factor, w, factor, c))
    return x.reshape(b, h * factor, w * factor, c)


def upconv3_dilated(x: jax.Array, kernel: jax.Array,
                    bias: Optional[jax.Array] = None,
                    out_dtype=None) -> jax.Array:
    """nearest-2x-upsample + 3x3 'SAME' conv as ONE lhs-dilated conv.

    Exact re-association of Upsample->Conv (femasr_arch.py:195-211), same
    math as fused_upsample2x_conv3 but emitted as a single
    lhs_dilation=(2,2) convolution with a derived 4x4 kernel, so XLA
    writes the interleaved HR output directly — no materialized upsampled
    tensor (the plain path's broadcast+pad+copy chain measured 14.8 GB
    per decoder level on v5e at 512px) and no phase-major reassembly
    relayout (the fused path's cost).

    Derivation (correlation form, per spatial dim): the SAME-pad conv on
    the upsampled signal is ref[p] = sum_u K[u] X[(p-1+u)//2], which
    splits by parity of p into taps {K0, K1+K2} / {K0+K1, K2} on adjacent
    X rows; over the 2x-dilated input with pad 2 that is a 4-tap kernel
    W = A K with A = [[1,0,0],[1,1,0],[0,1,1],[0,0,1]], applied
    independently to both spatial dims.
    """
    a = jnp.asarray([[1., 0., 0.], [1., 1., 0.], [0., 1., 1.], [0., 0., 1.]],
                    kernel.dtype)                            # (4, 3)
    w4 = jnp.einsum('au,bv,uvio->abio', a, a, kernel)        # (4, 4, I, O)
    if out_dtype is not None:
        w4 = w4.astype(out_dtype)
    y = jax.lax.conv_general_dilated(
        x, w4, (1, 1), ((2, 2), (2, 2)), lhs_dilation=(2, 2),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    return y if bias is None else y + bias.astype(y.dtype)


def pixel_shuffle(x: jax.Array, factor: int) -> jax.Array:
    """NHWC pixel shuffle: (B, H, W, C*r^2) -> (B, H*r, W*r, C).

    Channel ordering matches torch.nn.PixelShuffle on NCHW->NHWC converted
    weights: channel index = c * r^2 + dy * r + dx.
    """
    b, h, w, crr = x.shape
    c = crr // (factor * factor)
    x = x.reshape(b, h, w, c, factor, factor)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, h * factor, w * factor, c)


def pixel_unshuffle(x: jax.Array, factor: int) -> jax.Array:
    """Inverse pixel shuffle (arch_util.py:189 parity): channel-major packing."""
    b, h, w, c = x.shape
    oh, ow = h // factor, w // factor
    x = x.reshape(b, oh, factor, ow, factor, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(b, oh, ow, c * factor * factor)


def fused_upsample2x_conv3(x: jax.Array, kernel: jax.Array,
                           bias: Optional[jax.Array] = None) -> jax.Array:
    """nearest-2x-upsample followed by 3x3 'SAME' conv, computed WITHOUT
    materializing the upsampled tensor.

    Mathematically exact re-association: each of the 4 output phases
    (2i+ry, 2j+rx) sees only 2x2 distinct low-res pixels, with taps that are
    sums of the 3x3 kernel's rows/cols. Runs 4 low-res 2x2 convs + a pixel
    shuffle: 16*I*O FLOPs per LR pixel instead of 36*I*O, and the pre-conv
    HR activation (the HBM hog of the reference's Upsample->Conv decoder
    blocks, femasr_arch.py:195-211) never exists.

    Implemented as ONE 2x2 conv with 4*O output channels over the once-padded
    input (the 4 phases are output-channel blocks; their differing padding
    offsets become cheap spatial slices of the shared (h+1, w+1) result) —
    a single large MXU matmul instead of 4 small convs.

    kernel: (3, 3, I, O) — the SAME parameter as the plain conv path.
    """
    w = kernel
    rows0 = jnp.stack([w[0], w[1] + w[2]], 0)       # ry=0: taps [i-1, i]
    rows1 = jnp.stack([w[0] + w[1], w[2]], 0)       # ry=1: taps [i, i+1]

    def cols(wr, rx):
        if rx == 0:                                  # taps [j-1, j]
            return jnp.stack([wr[:, 0], wr[:, 1] + wr[:, 2]], 1)
        return jnp.stack([wr[:, 0] + wr[:, 1], wr[:, 2]], 1)  # [j, j+1]

    # (2, 2, I, 4O): phase p = ry*2 + rx stored as output-channel blocks
    kk = jnp.concatenate([cols(rows0, 0), cols(rows0, 1),
                          cols(rows1, 0), cols(rows1, 1)], axis=-1)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    y = jax.lax.conv_general_dilated(
        xp, kk.astype(x.dtype), (1, 1), 'VALID',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))  # (b, h+1, w+1, 4O)

    b, hp, wp, _ = y.shape
    h, wd = hp - 1, wp - 1
    o = kernel.shape[-1]
    p00 = y[:, :h, :wd, 0 * o:1 * o]   # pads (1,0),(1,0)
    p01 = y[:, :h, 1:, 1 * o:2 * o]    # pads (1,0),(0,1)
    p10 = y[:, 1:, :wd, 2 * o:3 * o]   # pads (0,1),(1,0)
    p11 = y[:, 1:, 1:, 3 * o:4 * o]    # pads (0,1),(0,1)
    out = jnp.stack([p00, p01, p10, p11], axis=-1)   # (..., O, 4) 4 = ry*2+rx
    out = out.reshape(b, h, wd, o * 4)
    out = pixel_shuffle(out, 2)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


# ---------------------------------------------------------------------------
# space-to-depth (S2D) evaluation of the decoder tail
#
# The last decoder level runs 3x3 convs on (2H, 2W, C) maps with C=64 — the
# MXU is half-empty in the lane dim and XLA reaches ~33 TF/s there. The SAME
# function evaluated on the 2x2 space-to-depth packing (H, W, 4C) as 2x2
# convs over 4C->4O channels reaches ~129 TF/s (measured; NOTES_ROUND2.md).
# Layout convention: phase-MAJOR channels, channel = (py*2+px)*C + c, where
# (py, px) is the within-2x2 position. All helpers below are mathematically
# exact re-associations of the HR ops (parity-tested to float tolerance).
# ---------------------------------------------------------------------------

# Trailing overhang of the padded S2D conv outputs. 1 = minimal (h+1, w+1)
# intermediates; 8 pads the conv output to a sublane-aligned (h+8, w+8) so
# the phase-slice reassembly reads tile-aligned windows (round-2 measured
# the h+1 intermediates breaking XLA's tiling — NOTES_ROUND2.md s2d_tail;
# costs ~(1+8/h)^2 extra conv FLOPs). Env-tunable for the TPU probe.
S2D_ALIGN = max(1, int(os.environ.get('FEMASR_S2D_ALIGN', '1')))


def s2d_phase_slices(y: jax.Array, o: int, align: int = None) -> jax.Array:
    """Re-align the 4 phase blocks of a padded S2D conv output.

    y: (B, h+k, w+k, 4O) from a ((1,k),(1,k))-padded VALID 2x2 conv
    (k = align); phase p=py*2+px lives in channels [p*O:(p+1)*O] and needs
    spatial offset (py, px). Returns (B, h, w, 4O) phase-major.
    """
    k = S2D_ALIGN if align is None else align
    b, hp, wp, _ = y.shape
    h, w = hp - k, wp - k
    return jnp.concatenate([
        y[:, :h, :w, 0 * o:1 * o],
        y[:, :h, 1:1 + w, 1 * o:2 * o],
        y[:, 1:1 + h, :w, 2 * o:3 * o],
        y[:, 1:1 + h, 1:1 + w, 3 * o:4 * o],
    ], axis=-1)


def upconv3_s2d(x: jax.Array, kernel: jax.Array,
                bias: Optional[jax.Array] = None) -> jax.Array:
    """nearest-2x-upsample + 3x3 conv, emitting the S2D (phase-major) form.

    Same math as fused_upsample2x_conv3 but WITHOUT the final pixel shuffle:
    the output (B, H, W, 4O) stays in the space-to-depth domain for the
    downstream S2D ResBlocks. kernel: (3, 3, I, O).
    """
    w = kernel
    rows0 = jnp.stack([w[0], w[1] + w[2]], 0)
    rows1 = jnp.stack([w[0] + w[1], w[2]], 0)

    def cols(wr, rx):
        if rx == 0:
            return jnp.stack([wr[:, 0], wr[:, 1] + wr[:, 2]], 1)
        return jnp.stack([wr[:, 0] + wr[:, 1], wr[:, 2]], 1)

    kk = jnp.concatenate([cols(rows0, 0), cols(rows0, 1),
                          cols(rows1, 0), cols(rows1, 1)], axis=-1)
    y = jax.lax.conv_general_dilated(
        x, kk.astype(x.dtype), (1, 1), ((1, S2D_ALIGN), (1, S2D_ALIGN)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    out = s2d_phase_slices(y, kernel.shape[-1])
    if bias is not None:
        out = out + jnp.tile(bias, 4).astype(out.dtype)
    return out


# tap tables: ROWMAP[py][r'][qy] = HR kernel row (or -1) contributing to
# out-phase py from LR row offset r' and in-phase qy. Derived from
# HR[2i+py+u] = S2D[i + a, phase (py+u) mod 2] with a = (py+u)//2; the
# py=0 slice covers a in {-1, 0} (base row 0 of the padded conv), py=1
# covers a in {0, 1} (base row 1) — exactly the s2d_phase_slices offsets.
_S2D_TAPMAP = (((-1, 0), (1, 2)),   # py=0: r'=0 -> (qy0:none, qy1:w0); r'=1 -> (w1, w2)
               ((0, 1), (2, -1)))   # py=1: r'=0 -> (w0, w1); r'=1 -> (w2, none)


def _s2d_kernel_from_hr(kernel: jax.Array) -> jax.Array:
    """(3, 3, I, O) HR conv kernel -> (2, 2, 4I, 4O) S2D kernel (phase-major)."""
    i_ch, o_ch = kernel.shape[2], kernel.shape[3]
    zeros = jnp.zeros((i_ch, o_ch), kernel.dtype)
    rows = []
    for rp in range(2):           # LR row offset r'
        cols_out = []
        for cp in range(2):       # LR col offset c'
            # block matrix over (in-phase) x (out-phase)
            out_blocks = []
            for py in range(2):
                for px in range(2):
                    in_blocks = []
                    for qy in range(2):
                        for qx in range(2):
                            u = _S2D_TAPMAP[py][rp][qy]
                            v = _S2D_TAPMAP[px][cp][qx]
                            in_blocks.append(zeros if (u < 0 or v < 0)
                                             else kernel[u, v])
                    out_blocks.append(jnp.concatenate(in_blocks, axis=0))
            cols_out.append(jnp.concatenate(out_blocks, axis=1))
        rows.append(jnp.stack(cols_out, axis=0))
    return jnp.stack(rows, axis=0)   # (2, 2, 4I, 4O)


def conv3_s2d(x_s2d: jax.Array, kernel: jax.Array,
              bias: Optional[jax.Array] = None) -> jax.Array:
    """3x3 SAME HR conv evaluated on the S2D tensor (phase-major).

    x_s2d: (B, H, W, 4I); kernel: (3, 3, I, O) — the SAME parameter as the
    plain HR conv. Returns (B, H, W, 4O) phase-major.
    """
    kk = _s2d_kernel_from_hr(kernel).astype(x_s2d.dtype)
    y = jax.lax.conv_general_dilated(
        x_s2d, kk, (1, 1), ((1, S2D_ALIGN), (1, S2D_ALIGN)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    out = s2d_phase_slices(y, kernel.shape[-1])
    if bias is not None:
        out = out + jnp.tile(bias, 4).astype(out.dtype)
    return out


# ---------------------------------------------------------------------------
# int8 (w8a8) serving convs for the decoder tail
#
# The C=64 HR convs sit at XLA's ~50-60 TF/s bf16 shape ceiling
# (NOTES_ROUND2.md); the v5e MXU's int8 path peaks at 2x bf16. These
# helpers quantize weights per-output-channel (symmetric, static given
# params) and activations per-tensor (symmetric, dynamic — one extra
# max-reduction pass), accumulate in int32 on the MXU and dequantize into
# the caller's dtype. Serving-only: no gradients, opt-in via
# FeMaSRNet(int8_tail=True).
# ---------------------------------------------------------------------------

def conv3_w8a8(x: jax.Array, kernel: jax.Array,
               bias: Optional[jax.Array] = None) -> jax.Array:
    """3x3 SAME conv computed in int8 (w8a8, int32 accumulation).

    x: (B, H, W, I); kernel: (3, 3, I, O) float (the SAME parameter as
    the plain conv path — quantization happens on the fly, so int8 mode
    is checkpoint-free). Returns (B, H, W, O) in x.dtype.

    FEMASR_INT8_BACKEND=pallas routes through the fused Pallas kernel
    (ops/pallas/int8_dense.py): same numerics, but quant/dequant/bias stay
    in VMEM instead of costing extra HBM passes (XLA's int8 path measured
    a 6.6% full-graph LOSS from exactly those passes, NOTES_ROUND3.md).
    """
    if os.environ.get('FEMASR_INT8_BACKEND') == 'pallas':
        from .pallas.int8_dense import conv3_w8a8 as _conv3_pallas
        return _conv3_pallas(x, kernel, bias)
    kf = kernel.astype(jnp.float32)
    s_w = jnp.max(jnp.abs(kf), axis=(0, 1, 2)) / 127.0        # (O,)
    s_w = jnp.maximum(s_w, 1e-12)
    k_q = jnp.round(kf / s_w).astype(jnp.int8)

    xf = x.astype(jnp.float32)
    s_x = jnp.max(jnp.abs(xf)) / 127.0                        # scalar
    s_x = jnp.maximum(s_x, 1e-12)
    x_q = jnp.round(xf / s_x).astype(jnp.int8)

    acc = jax.lax.conv_general_dilated(
        x_q, k_q, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (s_x * s_w)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def dense_w8a8(x: jax.Array, kernel: jax.Array,
               bias: Optional[jax.Array] = None) -> jax.Array:
    """Dense layer computed in int8 (w8a8, int32 MXU accumulation).

    x: (..., I); kernel: (I, O) float (the SAME parameter layout as
    nn.Dense, so int8 mode is checkpoint-free). Weights are quantized
    per-output-channel (symmetric, static given params), activations
    per-tensor (symmetric, dynamic — one extra max-reduction). Returns
    (..., O) in x.dtype. Serving-only: no gradients.

    FEMASR_INT8_BACKEND=pallas routes through the fused Pallas kernel
    (see conv3_w8a8 docstring).
    """
    if os.environ.get('FEMASR_INT8_BACKEND') == 'pallas':
        from .pallas.int8_dense import matmul_w8a8 as _mm_pallas
        return _mm_pallas(x, kernel, bias)
    kf = kernel.astype(jnp.float32)
    s_w = jnp.max(jnp.abs(kf), axis=0) / 127.0                # (O,)
    s_w = jnp.maximum(s_w, 1e-12)
    k_q = jnp.round(kf / s_w).astype(jnp.int8)

    xf = x.astype(jnp.float32)
    s_x = jnp.max(jnp.abs(xf)) / 127.0                        # scalar
    s_x = jnp.maximum(s_x, 1e-12)
    x_q = jnp.round(xf / s_x).astype(jnp.int8)

    acc = jax.lax.dot_general(
        x_q, k_q, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (s_x * s_w)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# per-token int8 chain (round-4 A/B lesson, NOTES_ROUND4.md): the per-TENSOR
# int8 integration above costs a standalone whole-tensor max-reduction pass
# per op plus bf16 materialization of every intermediate — measured bytes
# 97.3 -> 151.8/174.5 GB on the 512px serving program (a 2.9x wall-clock
# LOSS). The chain formulation keeps activations in int8 ACROSS ops:
# per-token (row) scales are local to each row, so (a) the input quantize
# is a row-reduction XLA can fuse into the producer (LayerNorm), (b) an op
# can emit quantized output from its own epilogue with zero extra passes,
# and (c) a consumer dequantizes exactly with the (.., 1) scale column.
# Serving-only, checkpoint-free, opt-in via FEMASR_INT8_CHAIN=1.
# ---------------------------------------------------------------------------

def quantize_rows(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-token symmetric int8 quantization: (..., K) -> int8 + (..., 1)
    f32 scales. Row-local, so XLA fuses it into x's producer (the swin
    LayerNorm shares the same row-loop structure)."""
    xf = x.astype(jnp.float32)
    s = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-12)
    return jnp.round(xf / s).astype(jnp.int8), s


def dense_w8a8_ptok(x_q: jax.Array, s_x: jax.Array, kernel: jax.Array,
                    bias: Optional[jax.Array] = None,
                    act: Optional[str] = None, out_int8: bool = False,
                    out_dtype: Dtype = jnp.bfloat16):
    """Per-token w8a8 dense on pre-quantized input (XLA reference
    semantics; ops/pallas/int8_dense.py matmul_w8a8_q fuses the same
    pipeline into VMEM).

    x_q: (..., K) int8; s_x: (..., 1) f32 per-token scales.
    kernel: (K, N) float (same param as nn.Dense — checkpoint-free).
    act: optional fused activation ('gelu' = tanh-approx, matching the
        bf16 swin MLP; 'silu'; 'lrelu').
    out_int8: emit (y_q int8, s_y (..., 1) f32) from the epilogue instead
        of a float tensor — the chain link that keeps the MLP's 4x-wide
        intermediate off HBM at bf16 width.
    """
    kf = kernel.astype(jnp.float32)
    s_w = jnp.maximum(jnp.max(jnp.abs(kf), axis=0) / 127.0, 1e-12)  # (N,)
    k_q = jnp.round(kf / s_w).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_q, k_q, (((x_q.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (s_x * s_w)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    if act == 'gelu':
        y = jax.nn.gelu(y, approximate=True)
    elif act == 'silu':
        y = y * jax.nn.sigmoid(y)
    elif act == 'lrelu':
        y = jnp.where(y >= 0, y, 0.2 * y)
    elif act is not None:
        raise ValueError(f'unknown fused activation {act!r}')
    if out_int8:
        return quantize_rows(y)
    return y.astype(out_dtype)


class DenseInt8(nn.Module):
    """nn.Dense computed in w8a8 int8; param names/shapes identical to
    nn.Dense (kernel (I, O) [+ bias (O,)]) so checkpoints interchange
    with the float path. Serving-only, opt-in via
    FeMaSRNet(int8_swin=True) for the swin linears.

    Two input forms:
      - a float array: per-tensor dynamic activation scale (the round-3
        formulation), float output.
      - an (x_q int8, s_x f32) tuple: the per-token chain — consumes
        pre-quantized input and, with out_int8=True, emits quantized
        output from the epilogue (plus optional fused `act`).
    """
    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, act: Optional[str] = None,
                 out_int8: bool = False):
        chained = isinstance(x, tuple)
        in_ch = (x[0] if chained else x).shape[-1]
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (in_ch, self.features), jnp.float32)
        bias = (self.param('bias', nn.initializers.zeros,
                           (self.features,), jnp.float32)
                if self.use_bias else None)
        if not chained:
            assert act is None and not out_int8, \
                'fused act / int8 output are chain-mode features'
            return dense_w8a8(x.astype(self.dtype), kernel, bias)
        x_q, s_x = x
        if os.environ.get('FEMASR_INT8_BACKEND') == 'pallas':
            from .pallas.int8_dense import matmul_w8a8_q
            # FEMASR_INT8_TM: token-tile override (the Mosaic compile
            # probe's crash-bisect knob — see pallas_compile_probe.py)
            return matmul_w8a8_q(x_q, s_x, kernel, bias, act=act,
                                 out_int8=out_int8, out_dtype=self.dtype,
                                 tm=int(os.environ.get('FEMASR_INT8_TM',
                                                       '256')))
        return dense_w8a8_ptok(x_q, s_x, kernel, bias, act=act,
                               out_int8=out_int8, out_dtype=self.dtype)


def pixel_shuffle_phase_major(x: jax.Array) -> jax.Array:
    """(B, H, W, 4C) phase-major S2D -> (B, 2H, 2W, C)."""
    b, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h, w, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, 2 * h, 2 * w, c)


class GroupNormS2D(nn.Module):
    """GroupNorm over HR channels, evaluated on the phase-major S2D tensor.

    Parameter names/shapes identical to GroupNorm ((C,) over HR channels),
    so checkpoints interchange. The 4 phases are spatial positions of the
    same HR channel, so they join the (H, W) statistic axes.
    """
    num_groups: int = 32
    eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c4 = x.shape[-1]
        c = c4 // 4
        g = self.num_groups
        scale = self.param('scale', nn.initializers.ones, (c,), jnp.float32)
        bias = self.param('bias', nn.initializers.zeros, (c,), jnp.float32)

        b = x.shape[0]
        # two-level reduction: per-S2D-channel spatial means first (keeps
        # the channel axis in the lane dimension — a direct (.., G, C/G)
        # reshape materializes with a 2-wide lane dim and 64x padding
        # waste, which OOMs at the decoder tail), then fold the tiny
        # (B, 4C) result into HR channel groups. Equal counts per channel
        # make the mean-of-means exact.
        # raw moments by default (chanraw — see GroupNorm above: the
        # shift-free streaming form measured -31% full-program bytes);
        # FEMASR_GN_IMPL=grouped/chanlast restores the shift-guarded pass.
        xf = x.astype(jnp.float32)
        if os.environ.get('FEMASR_GN_IMPL', 'chanraw') == 'chanraw':
            shift = jnp.zeros((b, g), jnp.float32)
            d = xf
        else:
            flat0 = xf.reshape(b, -1, c4)[:, 0, :]              # (B, 4C)
            shift = jax.lax.stop_gradient(
                flat0.reshape(b, 4, g, c // g)[:, 0, :, 0])     # (B, G)
            shift_c = jnp.tile(jnp.repeat(shift, c // g, axis=1), (1, 4))
            d = xf - shift_c.reshape((b,) + (1,) * (x.ndim - 2) + (c4,))
        m1 = d.mean(axis=tuple(range(1, x.ndim - 1)))           # (B, 4C)
        m2 = jnp.square(d).mean(axis=tuple(range(1, x.ndim - 1)))
        dmean = m1.reshape(b, 4, g, c // g).mean(axis=(1, 3))   # (B, G)
        dmean2 = m2.reshape(b, 4, g, c // g).mean(axis=(1, 3))
        mean = shift + dmean
        var = jnp.maximum(dmean2 - jnp.square(dmean), 0.0)
        inv = jax.lax.rsqrt(var + self.eps)
        mean_c = jnp.tile(jnp.repeat(mean, c // g, axis=1), (1, 4))  # (B, 4C)
        inv_c = jnp.tile(jnp.repeat(inv, c // g, axis=1), (1, 4))
        shape = (b,) + (1,) * (x.ndim - 2) + (c4,)
        mul = (inv_c.reshape(shape) * jnp.tile(scale, 4)).astype(self.dtype)
        sub = mean_c.reshape(shape).astype(self.dtype)
        return (x.astype(self.dtype) - sub) * mul + jnp.tile(
            bias, 4).astype(self.dtype)


def upconv3_ws2d(x: jax.Array, kernel: jax.Array,
                 bias: Optional[jax.Array] = None) -> jax.Array:
    """nearest-2x upsample + 3x3 SAME conv emitting the ws2d form directly.

    Same math as upconv3_dilated (exact re-association of
    femasr_arch.py:195-211's Upsample->Conv) but the W dimension's two
    output phases are folded into channels: one lhs_dilation=(2,1) conv
    with a derived (4, 3, I, 2O) kernel writes (B, 2H, W, 2O) — the
    ws2d view of the (B, 2H, 2W, O) HR output — so neither the HR NHWC
    tensor nor a to_ws2d relayout ever materializes (round-5: those two
    copies cost 2.1 GB of the remaining dec2 traffic,
    bench_evidence/ws2d_bytes_r5.txt).

    H derivation = upconv3_dilated's A-matrix; W taps per output phase:
    px=0 reads LR cols {w'-1: K_col0, w': K_col1+K_col2}, px=1 reads
    {w': K_col0+K_col1, w'+1: K_col2} — a 3-tap kernel under SAME(1,1)
    padding with the unused tap zero.
    """
    a4 = jnp.asarray([[1., 0., 0.], [1., 1., 0.], [0., 1., 1.],
                      [0., 0., 1.]], kernel.dtype)           # (4, 3)
    c0 = jnp.asarray([[1., 0., 0.], [0., 1., 1.], [0., 0., 0.]],
                     kernel.dtype)                           # (3, 3) px=0
    c1 = jnp.asarray([[0., 0., 0.], [1., 1., 0.], [0., 0., 1.]],
                     kernel.dtype)                           # px=1
    w0 = jnp.einsum('au,mv,uvio->amio', a4, c0, kernel)
    w1 = jnp.einsum('au,mv,uvio->amio', a4, c1, kernel)
    wws = jnp.concatenate([w0, w1], axis=-1).astype(x.dtype)  # (4,3,I,2O)
    y = jax.lax.conv_general_dilated(
        x, wws, (1, 1), ((2, 2), (1, 1)), lhs_dilation=(2, 1),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    if bias is not None:
        y = y + jnp.tile(bias, 2).astype(y.dtype)
    return y


def upconv3_ws2d2(x: jax.Array, kernel: jax.Array,
                  bias: Optional[jax.Array] = None) -> jax.Array:
    """upconv3_ws2d with the INPUT also in ws2d form (level chaining).

    x: (B, H, Wh, 2I) — ws2d of (B, H, 2*Wh, I); returns
    (B, 2H, 2*Wh, 2O) — ws2d of the (B, 2H, 4*Wh, O) HR output of
    nearest-2x + 3x3 SAME conv. Lets consecutive ws2d decoder levels
    chain without a from_ws2d relayout between them.

    Derivation: H side is upconv3_dilated's A-matrix; W side needs BOTH
    lhs dilation (output W = 2x input W) and phase blocks. With
    KH = A-fold(K) and Kc0/Kc12/Kc01/Kc2 its W-taps folded per output
    phase (as in upconv3_ws2d), the four W kernel positions carry the
    (q-in x p-out) blocks
        n=0: [[0,0],[Kc0,0]]   n=1: [[Kc0,0],[Kc12,Kc01]]
        n=2: [[Kc12,Kc01],[0,Kc2]]   n=3: [[0,Kc2],[0,0]]
    applied as one lhs_dilation=(2,2), padding=((2,2),(2,2)) conv with a
    (4, 4, 2I, 2O) kernel (checked against the composite path in
    tests/test_ws2d_conv.py).
    """
    a4 = jnp.asarray([[1., 0., 0.], [1., 1., 0.], [0., 1., 1.],
                      [0., 0., 1.]], kernel.dtype)
    kh = jnp.einsum('au,uvio->avio', a4, kernel)     # (4, 3, I, O)
    kc0, kc1, kc2 = kh[:, 0], kh[:, 1], kh[:, 2]
    kc12, kc01 = kc1 + kc2, kc0 + kc1
    z = jnp.zeros_like(kc0)

    def blk(q0p0, q0p1, q1p0, q1p1):
        # (4, 2I, 2O) from four (4, I, O) blocks
        top = jnp.concatenate([q0p0, q0p1], axis=-1)
        bot = jnp.concatenate([q1p0, q1p1], axis=-1)
        return jnp.concatenate([top, bot], axis=-2)

    k44 = jnp.stack([
        blk(z, z, kc0, z),
        blk(kc0, z, kc12, kc01),
        blk(kc12, kc01, z, kc2),
        blk(z, kc2, z, z),
    ], axis=1)                                        # (4, 4, 2I, 2O)
    y = jax.lax.conv_general_dilated(
        x, k44.astype(x.dtype), (1, 1), ((2, 2), (2, 2)),
        lhs_dilation=(2, 2),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    if bias is not None:
        y = y + jnp.tile(bias, 2).astype(y.dtype)
    return y


def to_ws2d(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, H, W/2, 2C) width-space-to-depth view.

    Pure reshape (memory-order preserving): element (m, qx*C + c) is HR
    pixel (2m + qx, c). For C=64 the result's last dim is exactly one
    128-lane tile — the ws2d decoder tail's whole point (see
    ops/pallas/ws2d_conv.py for the physical-byte rationale)."""
    b, h, w, c = x.shape
    return x.reshape(b, h, w // 2, 2 * c)


def from_ws2d(x: jax.Array) -> jax.Array:
    """(B, H, Wh, 2C) ws2d form -> (B, H, 2*Wh, C)."""
    b, h, wh, c2 = x.shape
    return x.reshape(b, h, 2 * wh, c2 // 2)


class GroupNormWs2D(nn.Module):
    """GroupNorm over HR channels, evaluated on the ws2d tensor.

    Parameter names/shapes identical to GroupNorm ((C,) over HR channels)
    so checkpoints interchange. The 2 width phases are spatial positions
    of the same HR channel, so they join the (H, Wh) statistic axes.
    Same chanraw two-level reduction as GroupNormS2D (per-ws2d-channel
    raw moments keep the channel axis in lanes; the tiny (B, 2C) fold
    into HR groups is exact because every channel sees equal counts).
    """
    num_groups: int = 32
    eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c2 = x.shape[-1]
        c = c2 // 2
        g = self.num_groups
        scale = self.param('scale', nn.initializers.ones, (c,), jnp.float32)
        bias = self.param('bias', nn.initializers.zeros, (c,), jnp.float32)

        b = x.shape[0]
        xf = x.astype(jnp.float32)
        m1 = xf.mean(axis=tuple(range(1, x.ndim - 1)))            # (B, 2C)
        m2 = jnp.square(xf).mean(axis=tuple(range(1, x.ndim - 1)))
        mean = m1.reshape(b, 2, g, c // g).mean(axis=(1, 3))      # (B, G)
        mean2 = m2.reshape(b, 2, g, c // g).mean(axis=(1, 3))
        var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
        inv = jax.lax.rsqrt(var + self.eps)
        mean_c = jnp.tile(jnp.repeat(mean, c // g, axis=1), (1, 2))
        inv_c = jnp.tile(jnp.repeat(inv, c // g, axis=1), (1, 2))
        shape = (b,) + (1,) * (x.ndim - 2) + (c2,)
        mul = (inv_c.reshape(shape) * jnp.tile(scale, 2)).astype(self.dtype)
        sub = mean_c.reshape(shape).astype(self.dtype)
        return (x.astype(self.dtype) - sub) * mul + jnp.tile(
            bias, 2).astype(self.dtype)


class GroupNormWs2DAffine(nn.Module):
    """GroupNormWs2D's statistics pass only: returns the folded per-
    ws2d-channel affine (a, b) with y = x * a + b equal to the full
    normalize. Parameter names/shapes identical to GroupNorm/
    GroupNormWs2D ('scale'/'bias' over HR channels) — checkpoints
    interchange; the normalize pass itself runs inside the ws2d conv
    kernel's prologue (ops/pallas/ws2d_conv.py pre_scale/pre_bias)."""
    num_groups: int = 32
    eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array):
        c2 = x.shape[-1]
        c = c2 // 2
        g = self.num_groups
        scale = self.param('scale', nn.initializers.ones, (c,), jnp.float32)
        bias = self.param('bias', nn.initializers.zeros, (c,), jnp.float32)
        b = x.shape[0]
        xf = x.astype(jnp.float32)
        m1 = xf.mean(axis=tuple(range(1, x.ndim - 1)))            # (B, 2C)
        m2 = jnp.square(xf).mean(axis=tuple(range(1, x.ndim - 1)))
        mean = m1.reshape(b, 2, g, c // g).mean(axis=(1, 3))      # (B, G)
        mean2 = m2.reshape(b, 2, g, c // g).mean(axis=(1, 3))
        var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
        inv = jax.lax.rsqrt(var + self.eps)
        mean_c = jnp.tile(jnp.repeat(mean, c // g, axis=1), (1, 2))
        inv_c = jnp.tile(jnp.repeat(inv, c // g, axis=1), (1, 2))
        a = inv_c * jnp.tile(scale, 2)                            # (B, 2C)
        bb = jnp.tile(bias, 2) - mean_c * a
        return a, bb


def resize_nearest(x: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """Nearest resize to arbitrary (H, W) matching torch F.interpolate(mode='nearest').

    torch nearest uses floor(out_idx * in / out) source indexing.
    """
    b, h, w, c = x.shape
    oh, ow = size
    if (oh, ow) == (h, w):
        return x
    if oh % h == 0 and ow % w == 0 and oh // h == ow // w:
        return upsample_nearest(x, oh // h)
    rows = (jnp.arange(oh) * h) // oh
    cols = (jnp.arange(ow) * w) // ow
    return x[:, rows][:, :, cols]


def resize_bilinear(x: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """Bilinear resize, align_corners=False (half-pixel centers), NHWC.

    Matches torch F.interpolate(mode='bilinear', align_corners=False); used by
    the U-Net discriminator's up path (discriminator_arch.py:46,51,56).
    """
    return jax.image.resize(x, (x.shape[0], size[0], size[1], x.shape[3]),
                            method='bilinear').astype(x.dtype)


class UpConv3(nn.Module):
    """nearest-2x upsample + 3x3 conv, with an optional exact fused path.

    Parameter layout identical to conv2d (kernel (3,3,I,O) + bias), so
    checkpoints are interchangeable between the plain and fused paths.
    """
    features: int
    fused: bool = True
    int8: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (3, 3, in_ch, self.features), jnp.float32)
        bias = self.param('bias', nn.initializers.zeros,
                          (self.features,), jnp.float32)
        if self.int8:
            return conv3_w8a8(upsample_nearest(x.astype(self.dtype), 2),
                              kernel, bias)
        # FEMASR_UPCONV overrides the formulation for byte/wall A/B probes:
        # 'tc' = single lhs-dilated conv, 'fused' = phase convs + shuffle,
        # 'plain' = materialized nearest-upsample + 3x3 conv.
        # DEFAULT 'tc': byte A/B on the full 512px v5e serving program
        # (2026-08-17): tc 97.3 GB vs plain 117.7 vs fused 164.6 — the
        # materialized upsample costs a broadcast+pad+relayout chain per
        # level and the phase-conv form pays even more in reassembly.
        impl = os.environ.get('FEMASR_UPCONV',
                              'fused' if self.fused else 'tc')
        if impl == 'tc':
            # derive the 4x4 tap-sum kernel in f32, cast once (avoids
            # double bf16 rounding of the K0+K1 sums)
            return upconv3_dilated(x.astype(self.dtype), kernel,
                                   bias, out_dtype=self.dtype)
        if impl == 'fused':
            return fused_upsample2x_conv3(x.astype(self.dtype),
                                          kernel.astype(self.dtype), bias)
        y = upsample_nearest(x.astype(self.dtype), 2)
        y = jax.lax.conv_general_dilated(
            y, kernel.astype(self.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        return y + bias.astype(self.dtype)


class Conv3Int8(nn.Module):
    """3x3 SAME conv in w8a8 int8; params match conv2d(features, 3, 1, 1)
    (kernel (3, 3, I, O) + bias) so checkpoints are interchangeable with
    the float path. Serving-only."""
    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (3, 3, in_ch, self.features), jnp.float32)
        bias = self.param('bias', nn.initializers.zeros,
                          (self.features,), jnp.float32)
        return conv3_w8a8(x.astype(self.dtype), kernel, bias)


class CombineQuantBlock(nn.Module):
    """Concat (after nearest-resizing input2) then 3x3 conv.

    Parity: fema_utils.py:87-99.
    """
    in_ch1: int
    in_ch2: int
    out_channel: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, input1: jax.Array,
                 input2: Optional[jax.Array] = None) -> jax.Array:
        if input2 is not None:
            input2 = resize_nearest(input2, input1.shape[1:3])
            x = jnp.concatenate([input1, input2], axis=-1)
        else:
            x = input1
        return conv2d(self.out_channel, 3, 1, 1, dtype=self.dtype, name='conv')(x)
