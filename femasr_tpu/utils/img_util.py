"""Image <-> array conversion and I/O.

Parity target: /root/reference/basicsr/utils/img_util.py (img2tensor:9,
tensor2img:38, imfrombytes:117, imwrite:135, crop_border:155). The TPU rebuild
is NHWC-native: model arrays are float32/bfloat16 `(..., H, W, C)` RGB in
[0, 1]; cv2 I/O stays BGR uint8 on the host.
"""

from __future__ import annotations

import math
import os
from typing import List, Sequence

import cv2
import numpy as np


def img2array(imgs, bgr2rgb: bool = True, float32: bool = True):
    """Convert cv2 image(s) (HWC BGR uint8/float) to model arrays (HWC RGB).

    Mirrors reference img2tensor (img_util.py:9-35) but returns numpy HWC
    arrays (the NHWC-native layout used on TPU) instead of CHW torch tensors.
    """

    def _convert(img):
        if img.ndim == 2:
            img = img[:, :, None]
        if img.shape[2] == 3 and bgr2rgb:
            if img.dtype == 'float64':
                img = img.astype('float32')
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        if float32:
            img = img.astype(np.float32)
        return img

    if isinstance(imgs, list):
        return [_convert(img) for img in imgs]
    return _convert(imgs)


# Backwards-compatible alias matching the reference public name.
img2tensor = img2array


def array2img(arrays, rgb2bgr: bool = True, out_type=np.uint8,
              min_max: Sequence[float] = (0, 1)):
    """Convert model output array(s) to cv2 image(s).

    Accepts 4D (NHWC -> tiled grid like the reference's make_grid path),
    3D (HWC) or 2D (HW) arrays. Values are clamped to `min_max`, rescaled to
    [0, 255] (for uint8) and returned HWC BGR. Mirrors reference tensor2img
    (img_util.py:38-86).
    """
    single = not isinstance(arrays, (list, tuple))
    if single:
        arrays = [arrays]
    result: List[np.ndarray] = []
    for arr in arrays:
        arr = np.asarray(arr, dtype=np.float32)
        arr = np.clip(arr, min_max[0], min_max[1])
        arr = (arr - min_max[0]) / (min_max[1] - min_max[0])
        if arr.ndim == 4:
            arr = make_grid(arr, nrow=int(math.sqrt(arr.shape[0])))
        if arr.ndim == 3:
            img = arr
            if img.shape[2] == 3 and rgb2bgr:
                img = cv2.cvtColor(img, cv2.COLOR_RGB2BGR)
            elif img.shape[2] == 1:
                img = img[:, :, 0]
        elif arr.ndim == 2:
            img = arr
        else:
            raise TypeError(f'Only support 4D, 3D or 2D array. Got {arr.ndim}D.')
        if out_type == np.uint8:
            img = (img * 255.0).round()
        img = img.astype(out_type)
        result.append(img)
    return result[0] if single else result


tensor2img = array2img


def make_grid(imgs: np.ndarray, nrow: int = 8, padding: int = 2,
              pad_value: float = 0.0) -> np.ndarray:
    """Tile a batch (N, H, W, C) into one (H', W', C) grid image."""
    n, h, w, c = imgs.shape
    ncol = min(nrow, n)
    nrow_ = int(math.ceil(n / ncol))
    grid = np.full((nrow_ * (h + padding) + padding,
                    ncol * (w + padding) + padding, c), pad_value,
                   dtype=imgs.dtype)
    for idx in range(n):
        r, cidx = divmod(idx, ncol)
        y = r * (h + padding) + padding
        x = cidx * (w + padding) + padding
        grid[y:y + h, x:x + w] = imgs[idx]
    return grid


def imfrombytes(content: bytes, flag: str = 'color',
                float32: bool = False) -> np.ndarray:
    """Decode an image from bytes (HWC BGR)."""
    img_np = np.frombuffer(content, np.uint8)
    imread_flags = {
        'color': cv2.IMREAD_COLOR,
        'grayscale': cv2.IMREAD_GRAYSCALE,
        'unchanged': cv2.IMREAD_UNCHANGED,
    }
    img = cv2.imdecode(img_np, imread_flags[flag])
    if float32:
        img = img.astype(np.float32) / 255.
    return img


def imwrite(img: np.ndarray, file_path: str, params=None,
            auto_mkdir: bool = True) -> None:
    if auto_mkdir:
        dir_name = os.path.abspath(os.path.dirname(file_path))
        os.makedirs(dir_name, exist_ok=True)
    ok = cv2.imwrite(file_path, img, params)
    if not ok:
        raise IOError('Failed in writing images.')


def crop_border(imgs, crop_border: int):
    """Crop borders of (lists of) HWC images."""
    if crop_border == 0:
        return imgs
    if isinstance(imgs, list):
        return [v[crop_border:-crop_border, crop_border:-crop_border, ...] for v in imgs]
    return imgs[crop_border:-crop_border, crop_border:-crop_border, ...]
