#!/usr/bin/env python
"""Pack image folders into FMRS shard archives for fast training I/O.

Parity: /root/reference/scripts/data_preparation/create_lmdb.py (LMDB is
replaced by the native mmap shard store).

Usage:
    python scripts/data_preparation/create_shard.py \
        --input ../datasets/HQ_sub --output ../datasets/HQ_sub.fmrs
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir, os.pardir))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--input', type=str, required=True)
    parser.add_argument('--output', type=str, required=True,
                        help='output .fmrs path')
    args = parser.parse_args()

    from femasr_tpu.native import make_shard_from_folder
    n = make_shard_from_folder(args.input, args.output)
    print(f'packed {n} images into {args.output}')


if __name__ == '__main__':
    main()
