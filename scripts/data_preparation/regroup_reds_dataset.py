#!/usr/bin/env python
"""Regroup the REDS train/val folders into one training tree.

Parity: /root/reference/scripts/data_preparation/regroup_reds_dataset.py —
240 training clips named 0..239; validation clips are renumbered 240..269
and copied into the train folder (clip separation is then done by index in
the dataset). Uses shutil instead of `os.system('cp -r ...')`.
"""
import argparse
import glob
import os
import shutil


def regroup_reds_dataset(train_path: str, val_path: str) -> None:
    for folder in sorted(glob.glob(os.path.join(val_path, '*'))):
        new_folder_idx = int(os.path.basename(folder)) + 240
        dst = os.path.join(train_path, str(new_folder_idx))
        print(f'{folder} -> {dst}')
        shutil.copytree(folder, dst, dirs_exist_ok=True)


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('--root', default='datasets/REDS',
                        help='REDS root containing train_sharp/, val_sharp/, '
                             'train_sharp_bicubic/X4/, val_sharp_bicubic/X4/')
    args = parser.parse_args()
    regroup_reds_dataset(os.path.join(args.root, 'train_sharp'),
                         os.path.join(args.root, 'val_sharp'))
    regroup_reds_dataset(os.path.join(args.root, 'train_sharp_bicubic', 'X4'),
                         os.path.join(args.root, 'val_sharp_bicubic', 'X4'))
