#!/usr/bin/env python
"""Download training/validation datasets (DIV2K, Flickr2K, OST, test sets).

Parity: /root/reference/scripts/download_datasets.py. Uses the shared
download cache; in air-gapped environments prints manual instructions.
"""

import argparse
import os

DATASETS = {
    'DIV2K_train_HR': 'http://data.vision.ee.ethz.ch/cvl/DIV2K/DIV2K_train_HR.zip',
    'DIV2K_valid_HR': 'http://data.vision.ee.ethz.ch/cvl/DIV2K/DIV2K_valid_HR.zip',
    'DIV2K_valid_LR_bicubic_X4': 'http://data.vision.ee.ethz.ch/cvl/DIV2K/DIV2K_valid_LR_bicubic_X4.zip',
    'Flickr2K': 'https://cv.snu.ac.kr/research/EDSR/Flickr2K.tar',
}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--dataset', type=str, default='DIV2K_train_HR',
                        choices=sorted(DATASETS))
    parser.add_argument('--out_dir', type=str, default='../datasets')
    args = parser.parse_args()

    url = DATASETS[args.dataset]
    os.makedirs(args.out_dir, exist_ok=True)
    target = os.path.join(args.out_dir, os.path.basename(url))
    if os.path.exists(target):
        print(f'already present: {target}')
        return
    try:
        from urllib.request import urlretrieve
        print(f'downloading {url} ...')
        urlretrieve(url, target)
        print(f'saved to {target}; unzip/untar it under {args.out_dir}')
    except Exception as e:
        raise SystemExit(
            f'download failed ({e}). Fetch manually:\n  {url}\n'
            f'and place the archive at {target}.')


if __name__ == '__main__':
    main()
