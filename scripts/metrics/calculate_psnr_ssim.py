#!/usr/bin/env python
"""PSNR/SSIM over paired result/GT folders.

Parity: /root/reference/scripts/metrics/calculate_psnr_ssim.py (which is
broken in the reference — it imports the missing `basicsr.metrics`; this one
runs against femasr_tpu.metrics).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir, os.pardir))
from os import path as osp

import cv2
import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--gt', type=str, required=True)
    parser.add_argument('--restored', type=str, required=True)
    parser.add_argument('--crop_border', type=int, default=4)
    parser.add_argument('--suffix', type=str, default='')
    parser.add_argument('--test_y_channel', action='store_true')
    args = parser.parse_args()

    from femasr_tpu.data.data_util import make_dataset
    from femasr_tpu.metrics import calculate_psnr, calculate_ssim

    psnr_all, ssim_all = [], []
    gt_paths = make_dataset(args.gt)
    for i, gt_path in enumerate(gt_paths):
        basename, ext = osp.splitext(osp.basename(gt_path))
        restored_path = osp.join(args.restored, basename + args.suffix + ext)
        if not osp.exists(restored_path):
            restored_path = osp.join(args.restored,
                                     basename + args.suffix + '.png')
        restored_bgr = cv2.imread(restored_path)
        if restored_bgr is None:
            print(f'{i + 1:3d}: {basename:25}. \tSKIPPED — restored image '
                  f'not found/readable at {restored_path}')
            continue
        gt = cv2.cvtColor(cv2.imread(gt_path), cv2.COLOR_BGR2RGB)
        restored = cv2.cvtColor(restored_bgr, cv2.COLOR_BGR2RGB)
        gt = gt.astype(np.float32) / 255.
        restored = restored.astype(np.float32) / 255.

        psnr = calculate_psnr(restored, gt, crop_border=args.crop_border,
                              test_y_channel=args.test_y_channel)
        ssim = calculate_ssim(restored, gt, crop_border=args.crop_border,
                              test_y_channel=args.test_y_channel)
        print(f'{i + 1:3d}: {basename:25}. \tPSNR: {psnr:.6f} dB, '
              f'\tSSIM: {ssim:.6f}')
        psnr_all.append(psnr)
        ssim_all.append(ssim)
    print(f'Average: PSNR: {np.mean(psnr_all):.6f} dB, '
          f'SSIM: {np.mean(ssim_all):.6f}')


if __name__ == '__main__':
    main()
