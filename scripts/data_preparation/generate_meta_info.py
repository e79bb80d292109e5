#!/usr/bin/env python
"""Generate meta_info.txt listing images and shapes.

Parity: /root/reference/scripts/data_preparation/generate_meta_info.py.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir, os.pardir))
from os import path as osp

from PIL import Image


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--input', type=str, required=True)
    parser.add_argument('--meta_info', type=str, required=True)
    args = parser.parse_args()

    from femasr_tpu.data.data_util import make_dataset
    paths = make_dataset(args.input)
    with open(args.meta_info, 'w') as f:
        for idx, p in enumerate(paths):
            img = Image.open(p)
            width, height = img.size
            mode = img.mode
            n_channel = {'RGB': 3, 'L': 1, 'RGBA': 4}.get(mode, 3)
            info = f'{osp.relpath(p, args.input)} ({height},{width},{n_channel})'
            print(idx + 1, info)
            f.write(f'{info}\n')


if __name__ == '__main__':
    main()
