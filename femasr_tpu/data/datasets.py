"""Datasets: paired LQ/GT, HQ-only with on-the-fly BSRGAN synthesis, LQ-only.

Capability parity with the reference datasets
(/root/reference/basicsr/data/paired_image_dataset.py:17-120,
bsrgan_train_dataset.py:26-87, single_image_dataset.py:11-69), re-based on a
framework-neutral protocol: `__getitem__` returns dicts of float32 HWC RGB
numpy arrays in [0, 1] (NHWC batches are stacked by the loader, no torch).
"""

from __future__ import annotations

import random
from typing import Dict

import cv2
import numpy as np

from ..utils.registry import DATASET_REGISTRY
from .data_util import make_dataset, paths_from_folder
from .degradations import degradation_bsrgan
from .transforms import augment, paired_random_crop, random_crop


def _read_rgb(path: str) -> np.ndarray:
    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise IOError(f'cannot read image: {path}')
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0


class ImageSource:
    """Uniform image access over a folder tree or a native .fmrs shard.

    Folder roots scan recursively (reference make_dataset); `.fmrs` roots use
    the mmap'd native shard store (femasr_tpu/native) — the LMDB-backend
    analogue with decode-free reads.
    """

    def __init__(self, root: str):
        self.root = root
        if root.endswith('.fmrs'):
            from ..native import ShardStoreReader
            self._reader = ShardStoreReader(root)
            self._paths = [f'{root}:{k}' for k in self._reader.keys()]
        else:
            self._reader = None
            self._paths = make_dataset(root)

    def __len__(self) -> int:
        return len(self._paths)

    def path(self, idx: int) -> str:
        return self._paths[idx]

    def get(self, idx: int) -> np.ndarray:
        if self._reader is not None:
            return self._reader.read(idx).astype(np.float32) / 255.0
        return _read_rgb(self._paths[idx])


def random_resize(img: np.ndarray, scale_factor: float = 1.0) -> np.ndarray:
    return cv2.resize(img, None, fx=scale_factor, fy=scale_factor,
                      interpolation=cv2.INTER_CUBIC)


@DATASET_REGISTRY.register()
class PairedImageDataset:
    """LQ/GT pairs from two folder trees (paired_image_dataset.py:17-120)."""

    def __init__(self, opt: dict):
        self.opt = opt
        self.gt_src = ImageSource(opt['dataroot_gt'])
        self.lq_src = ImageSource(opt['dataroot_lq'])

    def __len__(self) -> int:
        return len(self.gt_src)

    def __getitem__(self, index: int) -> Dict:
        gt_path = self.gt_src.path(index)
        lq_path = self.lq_src.path(index)
        img_gt = self.gt_src.get(index)
        img_lq = self.lq_src.get(index)

        if self.opt['phase'] == 'train':
            input_gt_size = img_gt.shape[0]
            input_lq_size = img_lq.shape[0]
            scale = input_gt_size // input_lq_size
            gt_size = self.opt['gt_size']

            if self.opt.get('use_resize_crop', False):
                input_gt_random_size = random.randint(gt_size, input_gt_size)
                input_gt_random_size -= input_gt_random_size % scale
                resize_factor = input_gt_random_size / input_gt_size
                img_gt = random_resize(img_gt, resize_factor)
                img_lq = random_resize(img_lq, resize_factor)
                img_gt, img_lq = paired_random_crop(img_gt, img_lq, gt_size,
                                                    scale, gt_path)

            img_gt, img_lq = augment([img_gt, img_lq],
                                     self.opt.get('use_flip', False),
                                     self.opt.get('use_rot', False))
        else:
            crop_eval_size = self.opt.get('crop_eval_size')
            if crop_eval_size:
                scale = img_gt.shape[0] // img_lq.shape[0]
                img_gt, img_lq = paired_random_crop(img_gt, img_lq,
                                                    crop_eval_size, scale,
                                                    gt_path)

        return {'lq': np.ascontiguousarray(img_lq),
                'gt': np.ascontiguousarray(img_gt),
                'lq_path': lq_path, 'gt_path': gt_path}


@DATASET_REGISTRY.register()
class BSRGANTrainDataset:
    """HQ-only dataset; synthesizes LQ on the fly with degradation_bsrgan
    (bsrgan_train_dataset.py:26-87)."""

    def __init__(self, opt: dict):
        self.opt = opt
        self.gt_src = ImageSource(opt['dataroot_gt'])

    def __len__(self) -> int:
        return len(self.gt_src)

    def __getitem__(self, index: int) -> Dict:
        scale = self.opt['scale']
        gt_path = self.gt_src.path(index)
        img_gt = self.gt_src.get(index)
        gt_size = self.opt['gt_size']

        if self.opt['phase'] == 'train':
            if self.opt.get('use_resize_crop', False):
                input_gt_size = img_gt.shape[0]
                input_gt_random_size = random.randint(gt_size, input_gt_size)
                resize_factor = input_gt_random_size / input_gt_size
                img_gt = random_resize(img_gt, resize_factor)
            img_gt = random_crop(img_gt, gt_size)

        if self.opt.get('on_device_degradation', False):
            # LQ synthesized on TPU inside the jitted train step
            # (ops/degradations_jax.py); ship the GT crop only.
            img_gt = augment(img_gt, self.opt.get('use_flip', False),
                             self.opt.get('use_rot', False))
            return {'gt': np.ascontiguousarray(img_gt),
                    'lq_path': gt_path, 'gt_path': gt_path}

        img_lq, img_gt = degradation_bsrgan(
            img_gt, sf=scale, lq_patchsize=gt_size // scale, use_crop=False)
        img_gt, img_lq = augment([img_gt, img_lq],
                                 self.opt.get('use_flip', False),
                                 self.opt.get('use_rot', False))
        return {'lq': np.ascontiguousarray(img_lq),
                'gt': np.ascontiguousarray(img_gt),
                'lq_path': gt_path, 'gt_path': gt_path}


@DATASET_REGISTRY.register()
class SingleImageDataset:
    """LQ-only inference dataset (single_image_dataset.py:11-69)."""

    def __init__(self, opt: dict):
        self.opt = opt
        if opt.get('meta_info_file') is not None:
            with open(opt['meta_info_file'], 'r') as f:
                self.lq_paths = [
                    f"{opt['dataroot_lq']}/{line.strip().split(' ')[0]}"
                    for line in f]
        else:
            self.lq_paths = paths_from_folder(opt['dataroot_lq'])
        self.mean = opt.get('mean')
        self.std = opt.get('std')

    def __len__(self) -> int:
        return len(self.lq_paths)

    def __getitem__(self, index: int) -> Dict:
        lq_path = self.lq_paths[index]
        img_lq = _read_rgb(lq_path)
        if self.opt.get('color') == 'y':
            from ..utils.matlab_functions import rgb2ycbcr
            img_lq = rgb2ycbcr(img_lq, y_only=True)[..., None]
        if self.mean is not None or self.std is not None:
            mean = np.asarray(self.mean or 0.0, np.float32)
            std = np.asarray(self.std or 1.0, np.float32)
            img_lq = (img_lq - mean) / std
        return {'lq': np.ascontiguousarray(img_lq), 'lq_path': lq_path}
