"""Dataset path utilities.

Parity: /root/reference/basicsr/data/data_util.py (make_dataset:23,
paired-path builders :119-257).
"""

from __future__ import annotations

import os
from os import path as osp
from typing import Dict, List

from ..utils.misc import is_image_file, scandir


def make_dataset(dir_path: str, max_dataset_size: float = float('inf'),
                 follow_links: bool = True) -> List[str]:
    """Recursively collect sorted image paths under `dir_path`."""
    images = []
    assert osp.isdir(dir_path), f'{dir_path} is not a valid directory'
    for root, _, fnames in sorted(os.walk(dir_path, followlinks=follow_links)):
        for fname in sorted(fnames):
            if is_image_file(fname):
                images.append(osp.join(root, fname))
    return images[:min(int(max_dataset_size), len(images))
                  if max_dataset_size != float('inf') else len(images)]


def paired_paths_from_folders(folders, keys, filename_tmpl: str = '{}'
                              ) -> List[Dict[str, str]]:
    """Pair LQ/GT paths from two folders by (templated) stem matching."""
    assert len(folders) == 2 and len(keys) == 2
    input_folder, gt_folder = folders
    input_key, gt_key = keys

    input_paths = list(scandir(input_folder))
    gt_paths = list(scandir(gt_folder))
    assert len(input_paths) == len(gt_paths), (
        f'{input_key} and {gt_key} datasets have different number of images: '
        f'{len(input_paths)}, {len(gt_paths)}.')
    paths = []
    for gt_path in sorted(gt_paths):
        basename, ext = osp.splitext(osp.basename(gt_path))
        input_name = f'{filename_tmpl.format(basename)}{ext}'
        input_path = osp.join(input_folder, input_name)
        assert input_name in input_paths, (
            f'{input_name} is not in {input_key}_paths.')
        paths.append({f'{input_key}_path': input_path,
                      f'{gt_key}_path': osp.join(gt_folder, gt_path)})
    return paths


def paired_paths_from_meta_info_file(folders, keys, meta_info_file: str,
                                     filename_tmpl: str = '{}'
                                     ) -> List[Dict[str, str]]:
    """Pair paths from a meta-info file listing GT names."""
    assert len(folders) == 2 and len(keys) == 2
    input_folder, gt_folder = folders
    input_key, gt_key = keys
    with open(meta_info_file, 'r') as f:
        gt_names = [line.strip().split(' ')[0] for line in f]
    paths = []
    for gt_name in gt_names:
        basename, ext = osp.splitext(osp.basename(gt_name))
        input_name = f'{filename_tmpl.format(basename)}{ext}'
        paths.append({f'{input_key}_path': osp.join(input_folder, input_name),
                      f'{gt_key}_path': osp.join(gt_folder, gt_name)})
    return paths


def paths_from_folder(folder: str) -> List[str]:
    return [osp.join(folder, p) for p in sorted(scandir(folder))]


# ---------------------------------------------------------------------------
# video-frame helpers (vestigial BasicSR video support,
# reference data_util.py:35-117, 289-337)
# ---------------------------------------------------------------------------

def read_img_seq(path, require_mod_crop: bool = False, scale: int = 1):
    """Read an ordered frame folder as one (T, H, W, C) float array."""
    import cv2
    import numpy as np

    from .transforms import mod_crop
    if isinstance(path, list):
        img_paths = path
    else:
        img_paths = sorted(paths_from_folder(path))
    imgs = []
    for p in img_paths:
        img = cv2.imread(p).astype('float32') / 255.
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        if require_mod_crop:
            img = mod_crop(img, scale)
        imgs.append(img)
    return np.stack(imgs, axis=0)


def generate_frame_indices(crt_idx: int, max_frame_num: int, num_frames: int,
                           padding: str = 'reflection') -> List[int]:
    """Temporal neighbor indices with border padding
    (data_util.py:64-117)."""
    assert num_frames % 2 == 1, 'num_frames should be an odd number.'
    assert padding in ('replicate', 'reflection', 'reflection_circle',
                       'circle'), f'Wrong padding mode: {padding}.'
    max_frame_num = max_frame_num - 1  # 0-based
    num_pad = num_frames // 2

    indices = []
    for i in range(crt_idx - num_pad, crt_idx + num_pad + 1):
        if i < 0:
            if padding == 'replicate':
                pad_idx = 0
            elif padding == 'reflection':
                pad_idx = -i
            elif padding == 'reflection_circle':
                pad_idx = crt_idx + num_pad - i
            else:
                pad_idx = num_frames + i
        elif i > max_frame_num:
            if padding == 'replicate':
                pad_idx = max_frame_num
            elif padding == 'reflection':
                pad_idx = max_frame_num * 2 - i
            elif padding == 'reflection_circle':
                pad_idx = (crt_idx - num_pad) - (i - max_frame_num)
            else:
                pad_idx = i - num_frames
        else:
            pad_idx = i
        indices.append(pad_idx)
    return indices


def duf_downsample(x, kernel_size: int = 13, scale: int = 4):
    """Gaussian blur + decimation used by DUF video SR
    (data_util.py:289-337). x: (T, H, W, C) or (H, W, C) numpy [0,1]."""
    import numpy as np

    from ..data.degradations import fspecial_gaussian, filter2d_mirror
    assert scale in (2, 3, 4), f'Only support scale (2, 3, 4), but got {scale}.'
    squeeze = x.ndim == 3
    frames = x[None] if squeeze else x
    sigma = 0.4 * scale
    kernel = fspecial_gaussian(kernel_size, sigma)
    outs = []
    pad = kernel_size // 2
    for frame in frames:
        blurred = filter2d_mirror(np.asarray(frame, np.float32), kernel)
        outs.append(blurred[pad % scale::scale, pad % scale::scale])
    out = np.stack(outs, axis=0)
    return out[0] if squeeze else out
