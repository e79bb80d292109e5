#!/usr/bin/env python
"""Stamp checkpoints with a content hash for release.

Parity: /root/reference/scripts/publish_models.py (sha-stamped model
publishing): renames model.ckpt -> model-<sha8>.ckpt and prints the digest.
"""

import argparse
import hashlib
import os
from os import path as osp


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('paths', nargs='+', help='checkpoint files to publish')
    args = parser.parse_args()

    for path in args.paths:
        with open(path, 'rb') as f:
            sha = hashlib.sha256(f.read()).hexdigest()
        base, ext = osp.splitext(path)
        out = f'{base}-{sha[:8]}{ext}'
        os.replace(path, out)
        print(f'{out}  sha256:{sha}')


if __name__ == '__main__':
    main()
