"""NHWC-native building-block layers (norm / act / resblock / combine).

Capability parity with /root/reference/basicsr/archs/fema_utils.py
(NormLayer:12, ActLayer:43, ResBlock:65, CombineQuantBlock:87), re-designed
for TPU: NHWC layout so convolutions map straight onto the MXU, float32
normalization statistics with a configurable (bfloat16) compute dtype, and
nearest-neighbor resizing expressed as reshape/broadcast (no gather).
"""

from __future__ import annotations

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
        # statistics in f32 (bf16-safe), normalization applied in the compute
        # dtype so no f32 activation tensors materialize in HBM
        xf = x.reshape(b, -1, g, c // g).astype(jnp.float32)
        mean = xf.mean(axis=(1, 3))                        # (B, G)
        var = xf.var(axis=(1, 3))                          # (B, G)
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
            # torch nn.GELU() default is the exact (erf) formulation
            return nn.gelu(x, approximate=False)
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
