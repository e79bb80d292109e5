"""Differentiable / jittable JPEG compression for on-device degradation.

Capability parity with /root/reference/basicsr/utils/diffjpeg.py (full
DCT-quantization JPEG: RGB->YCbCr, 2x2 chroma subsampling, 8x8 block DCT as a
tensor contraction, quality-scaled Annex-K quantization tables, inverse path,
differentiable rounding). The reference exports it unused and trains with
cv2/libjpeg in dataloader workers (bsrgan_util.py:561-567); here it is the
device-side JPEG for the jittable BSRGAN pipeline, so HQ-stage synthesis runs
on TPU.

TPU-first notes: the 8x8 DCT is a single einsum against a constant
(8,8,8,8) basis (MXU work); block split/merge are reshapes; quality is a
traced scalar so one compiled program serves all qualities.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# ITU-T T.81 Annex K quantization tables
Y_TABLE = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], np.float32)

C_TABLE = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], np.float32)


@functools.lru_cache(maxsize=None)
def _dct_basis() -> Tuple[np.ndarray, np.ndarray]:
    """(8,8,8,8) forward/inverse DCT-II bases with JPEG normalization."""
    x = np.arange(8)
    u = np.arange(8)
    cos = np.cos((2 * x[:, None] + 1) * u[None, :] * np.pi / 16)  # (x, u)
    alpha = np.where(u == 0, 1.0 / np.sqrt(2.0), 1.0)
    # forward: F[u,v] = 0.25 a(u) a(v) sum_{x,y} f[x,y] cos.. cos..
    fwd = 0.25 * np.einsum('u,v,xu,yv->xyuv', alpha, alpha, cos, cos)
    # inverse: f[x,y] = 0.25 sum_{u,v} a(u) a(v) F[u,v] cos.. cos..
    inv = 0.25 * np.einsum('u,v,xu,yv->uvxy', alpha, alpha, cos, cos)
    return fwd.astype(np.float32), inv.astype(np.float32)


def quality_to_factor(quality) -> jax.Array:
    """JPEG quality (1..100) -> quantization scale factor (diffjpeg.py:23-35)."""
    quality = jnp.asarray(quality, jnp.float32)
    factor = jnp.where(quality < 50, 5000.0 / quality, 200.0 - quality * 2.0)
    return factor / 100.0


def diff_round(x: jax.Array) -> jax.Array:
    """Differentiable rounding: round(x) + (x - round(x))^3 (diffjpeg.py:20)."""
    return jnp.round(x) + jnp.power(x - jnp.round(x), 3)


def rgb_to_ycbcr_jpeg(x: jax.Array) -> jax.Array:
    """JFIF RGB->YCbCr on [0,255] values."""
    mat = jnp.asarray([[0.299, 0.587, 0.114],
                       [-0.168736, -0.331264, 0.5],
                       [0.5, -0.418688, -0.081312]], x.dtype).T
    shift = jnp.asarray([0.0, 128.0, 128.0], x.dtype)
    return x @ mat + shift


def ycbcr_to_rgb_jpeg(x: jax.Array) -> jax.Array:
    mat = jnp.asarray([[1.0, 0.0, 1.402],
                       [1.0, -0.344136, -0.714136],
                       [1.0, 1.772, 0.0]], x.dtype).T
    shift = jnp.asarray([0.0, 128.0, 128.0], x.dtype)
    return (x - shift) @ mat


def _blockify(x: jax.Array) -> jax.Array:
    """(B, H, W) -> (B, H/8, W/8, 8, 8)."""
    b, h, w = x.shape
    return x.reshape(b, h // 8, 8, w // 8, 8).transpose(0, 1, 3, 2, 4)


def _unblockify(x: jax.Array, h: int, w: int) -> jax.Array:
    b = x.shape[0]
    return x.transpose(0, 1, 3, 2, 4).reshape(b, h, w)


def _compress_plane(plane: jax.Array, table: jax.Array, factor: jax.Array,
                    rounding) -> jax.Array:
    """DCT -> quantize -> round -> dequantize -> iDCT for one (B,H,W) plane."""
    fwd, inv = _dct_basis()
    blocks = _blockify(plane - 128.0)
    coeffs = jnp.einsum('bijxy,xyuv->bijuv', blocks, jnp.asarray(fwd))
    # libjpeg builds integer tables: round(table * factor) clamped to [1, 255]
    q = jnp.clip(jnp.round(table * factor), 1.0, 255.0)
    quantized = rounding(coeffs / q)
    dequant = quantized * q
    rec = jnp.einsum('bijuv,uvxy->bijxy', dequant, jnp.asarray(inv))
    return _unblockify(rec, plane.shape[1], plane.shape[2]) + 128.0


def jpeg_compress(x: jax.Array, quality, differentiable: bool = True
                  ) -> jax.Array:
    """JPEG round-trip on NHWC RGB images in [0, 1].

    quality may be a traced scalar or a per-batch array of any shape whose
    leading axis is B (normalized internally so it broadcasts against the
    (B, H/8, W/8, 8, 8) DCT blocks). H, W are padded to multiples of 16.
    """
    b, h, w, c = x.shape
    assert c == 3
    rounding = diff_round if differentiable else jnp.round
    factor = jnp.asarray(quality_to_factor(quality))
    if factor.ndim > 0:
        factor = factor.reshape(factor.shape[0], 1, 1, 1, 1)

    ph = (-h) % 16
    pw = (-w) % 16
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode='edge')

    ycc = rgb_to_ycbcr_jpeg(x.astype(jnp.float32) * 255.0)
    y, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]

    # 2x2 chroma subsample (mean pool), process, then nearest upsample
    def down(p):
        bb, hh, ww = p.shape
        return p.reshape(bb, hh // 2, 2, ww // 2, 2).mean(axis=(2, 4))

    def up(p):
        # triangle-filter upsampling (libjpeg "fancy upsampling")
        bb, hh, ww = p.shape
        return jax.image.resize(p, (bb, hh * 2, ww * 2), method='bilinear')

    y_r = _compress_plane(y, jnp.asarray(Y_TABLE), factor, rounding)
    cb_r = up(_compress_plane(down(cb), jnp.asarray(C_TABLE), factor, rounding))
    cr_r = up(_compress_plane(down(cr), jnp.asarray(C_TABLE), factor, rounding))

    rgb = ycbcr_to_rgb_jpeg(jnp.stack([y_r, cb_r, cr_r], axis=-1))
    out = jnp.clip(rgb / 255.0, 0.0, 1.0).astype(x.dtype)
    return out[:, :h, :w]
