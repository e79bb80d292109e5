"""MATLAB-compatible color conversions + resize re-export.

Parity: /root/reference/basicsr/utils/matlab_functions.py (imresize:86-178,
rgb2ycbcr:181, bgr2ycbcr:224, ycbcr2rgb:267, ycbcr2bgr:286). Color math is
array-library agnostic (works on numpy and jax arrays).
"""

from __future__ import annotations

import numpy as np

# MATLAB-exact bicubic resize lives in ops/resize (host + jittable versions).
from ..ops.resize import imresize, imresize_np  # noqa: F401


def _convert_input_type_range(img):
    """uint8 [0,255] or float [0,1] -> float32 [0,1]."""
    img_type = img.dtype
    if str(img_type) == 'uint8':
        return img.astype(np.float32) / 255.0, img_type
    return img.astype(np.float32), img_type


def _convert_output_type_range(img, dst_type):
    if str(dst_type) == 'uint8':
        return img.round().astype(np.uint8) if hasattr(img, 'round') else img
    return (img / 255.0).astype(np.float32)


def rgb2ycbcr(img, y_only: bool = False):
    """RGB -> YCbCr (MATLAB/ITU-R BT.601, offset 16/128).

    Input: HWC (or NHWC) RGB, float [0,1] or uint8. Output matches input range
    convention (float stays [0,1], uint8 stays [0,255]).
    """
    img_f, in_type = _convert_input_type_range(img)
    if y_only:
        out = (img_f @ np.array([65.481, 128.553, 24.966], np.float32)) + 16.0
    else:
        mat = np.array([[65.481, -37.797, 112.0],
                        [128.553, -74.203, -93.786],
                        [24.966, 112.0, -18.214]], np.float32)
        out = img_f @ mat + np.array([16, 128, 128], np.float32)
    return _convert_output_type_range(out, in_type)


def bgr2ycbcr(img, y_only: bool = False):
    img_f, in_type = _convert_input_type_range(img)
    if y_only:
        out = (img_f @ np.array([24.966, 128.553, 65.481], np.float32)) + 16.0
    else:
        mat = np.array([[24.966, 112.0, -18.214],
                        [128.553, -74.203, -93.786],
                        [65.481, -37.797, 112.0]], np.float32)
        out = img_f @ mat + np.array([16, 128, 128], np.float32)
    return _convert_output_type_range(out, in_type)


def ycbcr2rgb(img):
    img_f, in_type = _convert_input_type_range(img)
    img_f = img_f * 255.0
    mat = np.array([[0.00456621, 0.00456621, 0.00456621],
                    [0, -0.00153632, 0.00791071],
                    [0.00625893, -0.00318811, 0]], np.float32) * 255.0
    offset = np.array([-222.921, 135.576, -276.836], np.float32)
    out = img_f @ mat + offset
    return _convert_output_type_range(out, in_type)


def ycbcr2bgr(img):
    rgb = ycbcr2rgb(img)
    return rgb[..., ::-1]
