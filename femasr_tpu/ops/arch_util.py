"""Generic architecture blocks (BasicSR arch_util surface).

Capability parity with /root/reference/basicsr/archs/arch_util.py:
ResidualBlockNoBN (:63), pixel-shuffle Upsample (:94), flow_warp (:116),
resize_flow (:156), pixel_unshuffle (:189), DropPath (:291-313),
to_2tuple/trunc_normal_ (:208-287).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..models.swinir_arch import UpsampleShuffle  # noqa: F401
from .layers import conv2d, pixel_shuffle, pixel_unshuffle  # noqa: F401


def to_2tuple(x):
    return x if isinstance(x, tuple) else (x, x)


def trunc_normal_init(stddev: float = 0.02):
    """Truncated-normal initializer (timm trunc_normal_ parity, +-2 sigma)."""
    return nn.initializers.truncated_normal(stddev=stddev)


class ResidualBlockNoBN(nn.Module):
    """Conv-ReLU-Conv residual block without BN (arch_util.py:63-91)."""
    num_feat: int = 64
    res_scale: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        out = conv2d(self.num_feat, 3, 1, 1, dtype=self.dtype, name='conv1')(x)
        out = nn.relu(out)
        out = conv2d(self.num_feat, 3, 1, 1, dtype=self.dtype, name='conv2')(out)
        return identity + out * self.res_scale


Upsample = UpsampleShuffle  # conv + pixel-shuffle upsampler (arch_util.py:94)


def flow_warp(x: jax.Array, flow: jax.Array,
              interp_mode: str = 'bilinear',
              padding_mode: str = 'zeros') -> jax.Array:
    """Warp an NHWC image by optical flow (arch_util.py:116-153).

    flow: (B, H, W, 2) in (dx, dy) pixel offsets. Bilinear sampling with
    zero / border padding (align_corners=True grid like the reference).
    """
    b, h, w, c = x.shape
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing='ij')
    sx = xx[None] + flow[..., 0]
    sy = yy[None] + flow[..., 1]

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0

    def gather(yi, xi):
        if padding_mode == 'border':
            yi = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
            xi = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
            valid = jnp.ones_like(yi, jnp.float32)
        else:  # zeros
            valid = ((yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)).astype(
                jnp.float32)
            yi = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
            xi = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        batch_idx = jnp.arange(b)[:, None, None]
        vals = x[batch_idx, yi, xi]
        return vals * valid[..., None]

    if interp_mode == 'nearest':
        return gather(jnp.round(sy), jnp.round(sx))

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    fx = fx[..., None]
    fy = fy[..., None]
    return (v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy)
            + v10 * (1 - fx) * fy + v11 * fx * fy)


def resize_flow(flow: jax.Array, size_type: str, sizes: Tuple[int, int],
                interp_mode: str = 'bilinear') -> jax.Array:
    """Resize a flow field, rescaling its values (arch_util.py:156-186)."""
    b, h, w, _ = flow.shape
    if size_type == 'ratio':
        out_h, out_w = int(h * sizes[0]), int(w * sizes[1])
    elif size_type == 'shape':
        out_h, out_w = sizes
    else:
        raise ValueError(f'Size type should be ratio or shape, but got '
                         f'{size_type}.')
    ratio_h, ratio_w = out_h / h, out_w / w
    scaled = flow * jnp.asarray([ratio_w, ratio_h], flow.dtype)
    return jax.image.resize(scaled, (b, out_h, out_w, 2), method=interp_mode)


class DropPath(nn.Module):
    """Stochastic depth per sample (arch_util.py:291-313)."""
    drop_prob: float = 0.0
    deterministic: bool = True

    @nn.compact
    def __call__(self, x, deterministic=None):
        det = self.deterministic if deterministic is None else deterministic
        if det or self.drop_prob == 0.0:
            return x
        keep = 1.0 - self.drop_prob
        rng = self.make_rng('dropout')
        mask = jax.random.bernoulli(rng, keep,
                                    (x.shape[0],) + (1,) * (x.ndim - 1))
        return x / keep * mask
