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
