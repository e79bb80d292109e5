#!/usr/bin/env python
"""LPIPS over paired result/GT folders (native JAX LPIPS).

Parity: /root/reference/scripts/metrics/calculate_lpips.py (pyiqa/lpips-pkg
replaced by femasr_tpu.losses.lpips; weights converted from the standard
lpips-package checkpoint via --lpips_weights).
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
    parser.add_argument('--suffix', type=str, default='')
    parser.add_argument('--lpips_weights', type=str, required=True,
                        help='lpips-package .pth (lin heads + vgg16 slices)')
    args = parser.parse_args()

    from femasr_tpu.data.data_util import make_dataset
    from femasr_tpu.losses import convert_lpips_checkpoint
    from femasr_tpu.metrics.metric_util import LPIPSMetric
    from femasr_tpu.models.convert import load_torch_checkpoint

    sd = load_torch_checkpoint(args.lpips_weights, param_key=None)
    metric = LPIPSMetric(convert_lpips_checkpoint(sd))

    vals = []
    for i, gt_path in enumerate(make_dataset(args.gt)):
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
        gt = cv2.cvtColor(cv2.imread(gt_path),
                          cv2.COLOR_BGR2RGB).astype(np.float32) / 255.
        restored = cv2.cvtColor(restored_bgr,
                                cv2.COLOR_BGR2RGB).astype(np.float32) / 255.
        val = metric(restored, gt)
        print(f'{i + 1:3d}: {basename:25}. \tLPIPS: {val:.6f}')
        vals.append(val)
    print(f'Average: LPIPS: {np.mean(vals):.6f}')


if __name__ == '__main__':
    main()
