#!/usr/bin/env python
"""NIQE over a folder of images (native implementation, femasr_tpu.metrics.niqe).

Parity: /root/reference/scripts/metrics/calculate_niqe.py (broken in the
reference — missing basicsr.metrics). Pristine MVG parameters are fit once
from a pristine-image folder (--pristine) and cached as .npz.
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
    parser.add_argument('--input', type=str, required=True)
    parser.add_argument('--crop_border', type=int, default=0)
    parser.add_argument('--params', type=str, default='niqe_params.npz',
                        help='pristine MVG params: basicsr '
                             'niqe_pris_params.npz, the MATLAB '
                             'modelparameters.mat, or a fitted mu/cov .npz')
    parser.add_argument('--pristine', type=str, default=None,
                        help='folder of pristine images to fit params from')
    args = parser.parse_args()

    from femasr_tpu.data.data_util import make_dataset
    from femasr_tpu.metrics.niqe import (calculate_niqe, fit_niqe_params,
                                         load_niqe_pris_params)

    if not osp.exists(args.params):
        if args.pristine is None:
            raise SystemExit(
                f'{args.params} not found; either point --params at the '
                'standard basicsr niqe_pris_params.npz (canonical, '
                'literature-comparable) or pass --pristine <folder of HQ '
                'images> to fit local params once.')
        mu, cov = fit_niqe_params(args.pristine)
        np.savez(args.params, mu=mu, cov=cov)
        print(f'fitted pristine params from {args.pristine} -> {args.params}')
    mu, cov, window = load_niqe_pris_params(args.params)

    vals = []
    for i, p in enumerate(make_dataset(args.input)):
        img = cv2.cvtColor(cv2.imread(p),
                           cv2.COLOR_BGR2RGB).astype(np.float32) / 255.
        score = calculate_niqe(img, mu, cov, crop_border=args.crop_border,
                               gaussian_window=window)
        print(f'{i + 1:3d}: {osp.basename(p):25}. \tNIQE: {score:.6f}')
        vals.append(score)
    print(f'Average: NIQE: {np.mean(vals):.6f}')


if __name__ == '__main__':
    main()
