"""Device-side image filtering: filter2D + USM sharpening.

Parity: /root/reference/basicsr/utils/img_process_util.py (filter2D:7,
USMSharp:40-83 — Real-ESRGAN utilities). NHWC, jittable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def filter2d(img: jax.Array, kernel: jax.Array) -> jax.Array:
    """Convolve NHWC images with per-sample (B, k, k) or shared (k, k)
    kernels, reflect padding."""
    from ..ops.degradations_jax import depthwise_blur
    if kernel.ndim == 2:
        kernel = jnp.broadcast_to(kernel[None], (img.shape[0],) + kernel.shape)
    return depthwise_blur(img, kernel)


def _gaussian_kernel(radius: int = 50, sigma: float = 0.0) -> np.ndarray:
    size = radius
    if size % 2 == 0:
        size += 1
    if sigma <= 0:
        sigma = 0.3 * ((size - 1) * 0.5 - 1) + 0.8  # cv2 default rule
    x = np.arange(size) - size // 2
    k1 = np.exp(-(x ** 2) / (2 * sigma ** 2))
    k = np.outer(k1, k1)
    return (k / k.sum()).astype(np.float32)


def usm_sharp(img: jax.Array, weight: float = 0.5, radius: int = 50,
              threshold: int = 10) -> jax.Array:
    """Unsharp masking with a soft threshold mask (img_process_util.py:40-83).

    img: (B, H, W, C) in [0, 1].
    """
    kernel = jnp.asarray(_gaussian_kernel(radius))
    blur = filter2d(img, kernel)
    residual = img - blur
    mask = (jnp.abs(residual) * 255.0 > threshold).astype(img.dtype)
    soft_mask = filter2d(mask, kernel)
    sharp = jnp.clip(img + weight * residual, 0.0, 1.0)
    return soft_mask * sharp + (1.0 - soft_mask) * img


class USMSharp:
    """Module-style wrapper mirroring the reference class API."""

    def __init__(self, radius: int = 50, sigma: float = 0.0):
        self.kernel = jnp.asarray(_gaussian_kernel(radius, sigma))
        self.radius = radius

    def __call__(self, img, weight: float = 0.5, threshold: int = 10):
        blur = filter2d(img, self.kernel)
        residual = img - blur
        mask = (jnp.abs(residual) * 255.0 > threshold).astype(img.dtype)
        soft_mask = filter2d(mask, self.kernel)
        sharp = jnp.clip(img + weight * residual, 0.0, 1.0)
        return soft_mask * sharp + (1.0 - soft_mask) * img
