"""MATLAB-compatible bicubic resize, TPU-first.

Capability parity with the reference's `imresize_np`
(/root/reference/basicsr/data/bsrgan_util.py:95-165) and the torch
`imresize` (/root/reference/basicsr/utils/matlab_functions.py:86-178):
antialiased cubic kernel (a = -0.5), symmetric boundary handling, per-row
weight normalization and zero-column trimming.

TPU-first design: instead of the reference's per-output-pixel python loops,
the whole resize is expressed as two dense matrix multiplies
`out = R_h @ img @ R_w^T` with (out_len, in_len) resize matrices computed in
numpy at trace time (symmetric padding folded into in-range columns). Under
jit the matrices are program constants and the matmuls run on the MXU.
"""

from __future__ import annotations

import functools
import math
import jax.numpy as jnp
import numpy as np


def cubic(x: np.ndarray) -> np.ndarray:
    """MATLAB cubic interpolation kernel (a = -0.5)."""
    absx = np.abs(x)
    absx2 = absx ** 2
    absx3 = absx ** 3
    return ((1.5 * absx3 - 2.5 * absx2 + 1) * (absx <= 1)
            + (-0.5 * absx3 + 2.5 * absx2 - 4 * absx + 2)
            * ((absx > 1) & (absx <= 2)))


@functools.lru_cache(maxsize=None)
def matlab_resize_matrix(in_len: int, out_len: int, scale: float,
                         antialias: bool = True) -> np.ndarray:
    """Dense (out_len, in_len) MATLAB-bicubic resize matrix (float64->f32).

    Symmetric boundary extension is folded back into in-range column indices,
    so multiplying by this matrix is exactly the reference's pad-then-filter.
    """
    kernel_width = 4.0
    if scale < 1 and antialias:
        kernel_width = 4.0 / scale

    x = np.arange(1, out_len + 1, dtype=np.float64)
    u = x / scale + 0.5 * (1 - 1 / scale)
    left = np.floor(u - kernel_width / 2)
    p = int(math.ceil(kernel_width)) + 2

    indices = left[:, None] + np.arange(p)[None, :]  # 1-based source index
    dist = u[:, None] - indices
    if scale < 1 and antialias:
        weights = scale * cubic(dist * scale)
    else:
        weights = cubic(dist)
    weights = weights / weights.sum(axis=1, keepdims=True)

    # trim all-zero first/last columns (reference :78-84)
    zero_cols = (weights == 0).sum(axis=0)
    lo, hi = 0, p
    if not math.isclose(zero_cols[0], 0, rel_tol=1e-6):
        lo += 1
    if not math.isclose(zero_cols[-1], 0, rel_tol=1e-6):
        hi -= 1
    indices = indices[:, lo:hi]
    weights = weights[:, lo:hi]

    # fold symmetric extension into in-range indices: 1-based idx -> 0-based j
    mat = np.zeros((out_len, in_len), np.float64)
    for r in range(out_len):
        for c in range(indices.shape[1]):
            j = int(indices[r, c]) - 1
            if j < 0:
                j = -j - 1
            elif j >= in_len:
                j = 2 * in_len - 1 - j
            mat[r, j] += weights[r, c]
    return mat.astype(np.float32)


def _out_len(in_len: int, scale: float) -> int:
    return int(math.ceil(in_len * scale))


def imresize_np(img: np.ndarray, scale: float,
                antialiasing: bool = True) -> np.ndarray:
    """Host (numpy) MATLAB bicubic resize of an HWC or HW [0,1] image."""
    squeeze = img.ndim == 2
    if squeeze:
        img = img[:, :, None]
    h, w, c = img.shape
    rh = matlab_resize_matrix(h, _out_len(h, scale), scale, antialiasing)
    rw = matlab_resize_matrix(w, _out_len(w, scale), scale, antialiasing)
    out = np.einsum('oh,hwc->owc', rh, img.astype(np.float32))
    out = np.einsum('pw,owc->opc', rw, out)
    return out[:, :, 0] if squeeze else out


def imresize(x: jnp.ndarray, scale: float,
             antialiasing: bool = True) -> jnp.ndarray:
    """Jittable MATLAB bicubic resize of NHWC (or HWC) arrays.

    Shapes are static under jit; the resize matrices are baked constants.
    """
    batched = x.ndim == 4
    if not batched:
        x = x[None]
    _, h, w, _ = x.shape
    rh = jnp.asarray(matlab_resize_matrix(h, _out_len(h, scale), scale,
                                          antialiasing))
    rw = jnp.asarray(matlab_resize_matrix(w, _out_len(w, scale), scale,
                                          antialiasing))
    xf = x.astype(jnp.float32)
    out = jnp.einsum('oh,bhwc->bowc', rh, xf)
    out = jnp.einsum('pw,bowc->bopc', rw, out)
    return out if batched else out[0]
