#!/usr/bin/env python
"""MATLAB-exact bicubic LR generation (+ optional back-projection refinement).

Parity: /root/reference/scripts/matlab_scripts/*.m (generate_bicubic_img.m,
back_projection/*.m) — re-implemented over the MATLAB-exact resize in
femasr_tpu/ops/resize.py so no MATLAB is needed.

Usage:
    python scripts/data_preparation/generate_bicubic_lr.py \
        --input ../datasets/DIV2K_valid_HR --output ../datasets/lrx4 --scale 4
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir, os.pardir))
from os import path as osp

import cv2
import numpy as np


def back_projection(lr: np.ndarray, sr: np.ndarray, scale: int,
                    iters: int = 10) -> np.ndarray:
    """Iterative back-projection: enforce downsample(sr) == lr."""
    from femasr_tpu.ops.resize import imresize_np
    out = sr.copy()
    for _ in range(iters):
        down = imresize_np(out, 1.0 / scale)
        out = out + imresize_np(lr - down, scale)
    return np.clip(out, 0, 1)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--input', type=str, required=True)
    parser.add_argument('--output', type=str, required=True)
    parser.add_argument('--scale', type=int, default=4)
    parser.add_argument('--mod', action='store_true',
                        help='also write a gt_mod{scale} folder of mod-cropped GT')
    args = parser.parse_args()

    from femasr_tpu.data.data_util import make_dataset
    from femasr_tpu.data.transforms import mod_crop
    from femasr_tpu.ops.resize import imresize_np

    os.makedirs(args.output, exist_ok=True)
    mod_dir = None
    if args.mod:
        mod_dir = osp.join(osp.dirname(args.output.rstrip('/')),
                           f'gt_mod{args.scale}')
        os.makedirs(mod_dir, exist_ok=True)

    for i, p in enumerate(make_dataset(args.input)):
        img = cv2.imread(p, cv2.IMREAD_COLOR)
        if img is None:
            continue
        rgb = cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.
        rgb = mod_crop(rgb, args.scale)
        lr = imresize_np(rgb, 1.0 / args.scale)
        name = osp.basename(p)
        cv2.imwrite(osp.join(args.output, name), cv2.cvtColor(
            (np.clip(lr, 0, 1) * 255).round().astype(np.uint8),
            cv2.COLOR_RGB2BGR))
        if mod_dir:
            cv2.imwrite(osp.join(mod_dir, name), cv2.cvtColor(
                (rgb * 255).round().astype(np.uint8), cv2.COLOR_RGB2BGR))
        print(f'{i + 1}: {name}', flush=True)


if __name__ == '__main__':
    main()
