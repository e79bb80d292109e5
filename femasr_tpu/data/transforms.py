"""Image transforms for training datasets.

Parity: /root/reference/basicsr/data/transforms.py (mod_crop:6,
paired_random_crop:26-91, augment:94-158, img_rotate:161). Numpy/HWC only —
the tensor branch of the reference is unnecessary in the host pipeline.
"""

from __future__ import annotations

import random
import cv2
import numpy as np


def mod_crop(img: np.ndarray, scale: int) -> np.ndarray:
    """Crop H and W to multiples of `scale`."""
    img = img.copy()
    if img.ndim in (2, 3):
        h, w = img.shape[0], img.shape[1]
        h_remainder, w_remainder = h % scale, w % scale
        img = img[:h - h_remainder if h_remainder else h,
                  :w - w_remainder if w_remainder else w, ...]
    else:
        raise ValueError(f'Wrong img ndim: {img.ndim}.')
    return img


def random_crop(img: np.ndarray, out_size: int) -> np.ndarray:
    """Single-image random crop (bsrgan_train_dataset.py:19-23)."""
    h, w = img.shape[:2]
    top = random.randint(0, h - out_size)
    left = random.randint(0, w - out_size)
    return img[top:top + out_size, left:left + out_size, ...]


def paired_random_crop(img_gts, img_lqs, gt_patch_size: int, scale: int,
                       gt_path=None):
    """Random-crop matching GT/LQ patches (transforms.py:26-91)."""
    if not isinstance(img_gts, list):
        img_gts = [img_gts]
    if not isinstance(img_lqs, list):
        img_lqs = [img_lqs]

    h_lq, w_lq = img_lqs[0].shape[0:2]
    h_gt, w_gt = img_gts[0].shape[0:2]
    lq_patch_size = gt_patch_size // scale

    if h_gt != h_lq * scale or w_gt != w_lq * scale:
        raise ValueError(f'Scale mismatches. GT ({h_gt}, {w_gt}) is not '
                         f'{scale}x multiplication of LQ ({h_lq}, {w_lq}). '
                         f'{gt_path}')
    if h_lq < lq_patch_size or w_lq < lq_patch_size:
        raise ValueError(f'LQ ({h_lq}, {w_lq}) is smaller than patch size '
                         f'({lq_patch_size}, {lq_patch_size}). {gt_path}')

    top = random.randint(0, h_lq - lq_patch_size)
    left = random.randint(0, w_lq - lq_patch_size)
    img_lqs = [v[top:top + lq_patch_size, left:left + lq_patch_size, ...]
               for v in img_lqs]
    top_gt, left_gt = int(top * scale), int(left * scale)
    img_gts = [v[top_gt:top_gt + gt_patch_size,
                 left_gt:left_gt + gt_patch_size, ...] for v in img_gts]

    if len(img_gts) == 1:
        img_gts = img_gts[0]
    if len(img_lqs) == 1:
        img_lqs = img_lqs[0]
    return img_gts, img_lqs


def augment(imgs, hflip: bool = True, rotation: bool = True, flows=None,
            return_status: bool = False):
    """Random horizontal flip / vertical flip / 90-degree rotation
    (transforms.py:94-158)."""
    hflip = hflip and random.random() < 0.5
    vflip = rotation and random.random() < 0.5
    rot90 = rotation and random.random() < 0.5

    def _augment(img):
        if hflip:
            img = cv2.flip(img, 1)
        if vflip:
            img = cv2.flip(img, 0)
        if rot90:
            img = img.transpose(1, 0, 2)
        return img

    def _augment_flow(flow):
        if hflip:
            flow = cv2.flip(flow, 1)
            flow[:, :, 0] *= -1
        if vflip:
            flow = cv2.flip(flow, 0)
            flow[:, :, 1] *= -1
        if rot90:
            flow = flow.transpose(1, 0, 2)
            flow = flow[:, :, [1, 0]]
        return flow

    if not isinstance(imgs, list):
        imgs = [imgs]
    imgs = [_augment(img) for img in imgs]
    if len(imgs) == 1:
        imgs = imgs[0]

    if flows is not None:
        if not isinstance(flows, list):
            flows = [flows]
        flows = [_augment_flow(flow) for flow in flows]
        if len(flows) == 1:
            flows = flows[0]
        return imgs, flows
    if return_status:
        return imgs, (hflip, vflip, rot90)
    return imgs


def img_rotate(img: np.ndarray, angle: float, center=None,
               scale: float = 1.0) -> np.ndarray:
    """Rotate by angle (counter-clockwise) around center (transforms.py:161)."""
    h, w = img.shape[:2]
    if center is None:
        center = ((w - 1) * 0.5, (h - 1) * 0.5)
    matrix = cv2.getRotationMatrix2D(center, angle, scale)
    return cv2.warpAffine(img, matrix, (w, h))
