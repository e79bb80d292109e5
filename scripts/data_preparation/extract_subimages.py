#!/usr/bin/env python
"""Crop large images into overlapping sub-images for training.

Parity: /root/reference/scripts/data_preparation/extract_subimages.py
(DIV2K-style tiling: crop_size 480, step 240, thresh_size 0).

Usage:
    python scripts/data_preparation/extract_subimages.py \
        --input ../datasets/DIV2K_train_HR --output ../datasets/HQ_sub \
        --crop_size 512 --step 256
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir, os.pardir))
from multiprocessing import Pool
from os import path as osp

import cv2
import numpy as np


def worker(args_tuple):
    path, opt = args_tuple
    crop_size = opt['crop_size']
    step = opt['step']
    thresh_size = opt['thresh_size']
    img_name, extension = osp.splitext(osp.basename(path))

    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if img is None:
        return f'{img_name}: unreadable'
    h, w = img.shape[0:2]
    if h < crop_size or w < crop_size:
        return f'{img_name}: skipped ({h}x{w} < crop_size {crop_size})'
    h_space = np.arange(0, h - crop_size + 1, step)
    if h - (h_space[-1] + crop_size) > thresh_size:
        h_space = np.append(h_space, h - crop_size)
    w_space = np.arange(0, w - crop_size + 1, step)
    if w - (w_space[-1] + crop_size) > thresh_size:
        w_space = np.append(w_space, w - crop_size)

    index = 0
    for x in h_space:
        for y in w_space:
            index += 1
            cropped = img[x:x + crop_size, y:y + crop_size, ...]
            cv2.imwrite(
                osp.join(opt['save_folder'],
                         f'{img_name}_s{index:03d}{extension}'),
                np.ascontiguousarray(cropped),
                [cv2.IMWRITE_PNG_COMPRESSION, opt['compression_level']])
    return f'{img_name}: {index} tiles'


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--input', type=str, required=True)
    parser.add_argument('--output', type=str, required=True)
    parser.add_argument('--crop_size', type=int, default=480)
    parser.add_argument('--step', type=int, default=240)
    parser.add_argument('--thresh_size', type=int, default=0)
    parser.add_argument('--compression_level', type=int, default=3)
    parser.add_argument('--n_thread', type=int, default=os.cpu_count())
    args = parser.parse_args()

    os.makedirs(args.output, exist_ok=True)
    opt = {'crop_size': args.crop_size, 'step': args.step,
           'thresh_size': args.thresh_size, 'save_folder': args.output,
           'compression_level': args.compression_level}

    from femasr_tpu.data.data_util import make_dataset
    paths = make_dataset(args.input)
    with Pool(max(args.n_thread, 1)) as pool:
        for msg in pool.imap_unordered(worker, [(p, opt) for p in paths]):
            print(msg, flush=True)
    print('All processes done.')


if __name__ == '__main__':
    main()
