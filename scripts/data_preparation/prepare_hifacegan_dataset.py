#!/usr/bin/env python
"""HiFaceGAN face-renovation training-pair synthesis.

Parity: /root/reference/scripts/data_preparation/prepare_hifacegan_dataset.py,
re-implemented with cv2/numpy (the reference uses the `imgaug` package, not
available here). Degradation templates match the reference settings:
sr4x, sr4x8x, denoise (gaussian/laplace/poisson per-channel), deblur
(motion/gaussian), jpeg (quality 50-85), 16x mosaic, and `face_renov`
(deblur+denoise+jpeg+sr4x8x in random order).
"""
import argparse
import os

import cv2
import numpy as np


def mosaic16x(img, rng):
    h, w = img.shape[:2]
    x = img.astype(np.float64)
    for i in range((h + 15) // 16):
        for j in range((w + 15) // 16):
            block = x[i * 16:(i + 1) * 16, j * 16:(j + 1) * 16]
            block[:] = block.mean(axis=(0, 1))
    return x.astype(np.uint8)


def sr4x(img, rng):
    h, w = img.shape[:2]
    s = rng.uniform(0.25, 0.25001)
    small = cv2.resize(img, (max(int(w * s), 1), max(int(h * s), 1)),
                       interpolation=cv2.INTER_AREA)
    return cv2.resize(small, (512, 512), interpolation=cv2.INTER_CUBIC)


def sr4x8x(img, rng):
    h, w = img.shape[:2]
    s = rng.uniform(0.125, 0.25)
    small = cv2.resize(img, (max(int(w * s), 1), max(int(h * s), 1)),
                       interpolation=cv2.INTER_AREA)
    return cv2.resize(small, (512, 512), interpolation=cv2.INTER_CUBIC)


def denoise_target(img, rng):
    """Additive gaussian/laplace/poisson noise, per-channel scales."""
    x = img.astype(np.float64)
    kind = rng.integers(0, 3)
    if kind == 0:
        scale = rng.uniform(20, 40, size=(1, 1, 3))
        x = x + rng.normal(0.0, 1.0, x.shape) * scale
    elif kind == 1:
        scale = rng.uniform(20, 40, size=(1, 1, 3))
        x = x + rng.laplace(0.0, 1.0, x.shape) * scale
    else:
        lam = rng.uniform(15, 30, size=(1, 1, 3))
        x = x + rng.poisson(lam, x.shape) * rng.choice([-1.0, 1.0], x.shape)
    return np.clip(x, 0, 255).astype(np.uint8)


def deblur_target(img, rng):
    if rng.integers(0, 2) == 0:
        k = int(rng.integers(10, 21))
        kernel = np.zeros((k, k), np.float64)
        angle = rng.uniform(0, 360)
        c = (k - 1) / 2
        d = np.array([np.cos(np.deg2rad(angle)), np.sin(np.deg2rad(angle))])
        for t in np.linspace(-c, c, k * 4):
            y, x = int(round(c + t * d[1])), int(round(c + t * d[0]))
            if 0 <= y < k and 0 <= x < k:
                kernel[y, x] = 1.0
        kernel /= kernel.sum()
        return cv2.filter2D(img, -1, kernel)
    sigma = rng.uniform(3.0, 8.0)
    return cv2.GaussianBlur(img, (0, 0), sigma)


def jpeg_target(img, rng):
    # imgaug JpegCompression(compression=50..85) -> cv2 quality 50..15
    quality = 100 - int(rng.integers(50, 86))
    ok, enc = cv2.imencode('.jpg', img, [cv2.IMWRITE_JPEG_QUALITY, quality])
    return cv2.imdecode(enc, cv2.IMREAD_COLOR)


TEMPLATES = {
    'sr4x': [sr4x],
    'sr4x8x': [sr4x8x],
    'denoise': [denoise_target],
    'deblur': [deblur_target],
    'jpeg': [jpeg_target],
    '16x': [mosaic16x],
    'face_renov': [deblur_target, denoise_target, jpeg_target, sr4x8x],
}


def create_training_dataset(deg, gt_folder, lq_folder=None, seed=0):
    if not lq_folder:
        lq_folder = '_'.join([gt_folder.replace('gt', 'lq'), deg])
    print(lq_folder)
    os.makedirs(lq_folder, exist_ok=True)
    assert deg in TEMPLATES, (
        f'Degradation type {deg} not recognized: {"|".join(TEMPLATES)}')
    ops = TEMPLATES[deg]
    rng = np.random.default_rng(seed)
    for name in sorted(os.listdir(gt_folder)):
        gt = cv2.imread(os.path.join(gt_folder, name))
        if gt is None:
            continue
        lq = gt
        order = rng.permutation(len(ops)) if deg == 'face_renov' \
            else range(len(ops))
        for i in order:
            lq = ops[i](lq, rng)
        cv2.imwrite(os.path.join(lq_folder, name), lq)
    print('Dataset prepared.')


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('--gt_folder', default='datasets/FFHQ_512_gt')
    parser.add_argument('--lq_folder', default=None)
    parser.add_argument('--deg', default='sr4x', choices=sorted(TEMPLATES))
    parser.add_argument('--seed', type=int, default=0)
    args = parser.parse_args()
    create_training_dataset(args.deg, args.gt_folder, args.lq_folder,
                            args.seed)
