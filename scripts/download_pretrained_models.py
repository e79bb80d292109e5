#!/usr/bin/env python
"""Fetch released pretrained models into the local weight cache.

Parity: /root/reference/scripts/download_pretrained_models.py. In air-gapped
environments prints the URL and the expected cache path instead.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

MODELS = {
    'FeMaSR_HRP_model_g': 'https://github.com/chaofengc/FeMaSR/releases/download/v0.1-pretrain_models/FeMaSR_HRP_model_g.pth',
    'FeMaSR_HRP_model_d': 'https://github.com/chaofengc/FeMaSR/releases/download/v0.1-pretrain_models/FeMaSR_HRP_model_d.pth',
    'FeMaSR_SRX2_model_g': 'https://github.com/chaofengc/FeMaSR/releases/download/v0.1-pretrain_models/FeMaSR_SRX2_model_g.pth',
    'FeMaSR_SRX4_model_g': 'https://github.com/chaofengc/FeMaSR/releases/download/v0.1-pretrain_models/FeMaSR_SRX4_model_g.pth',
}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('models', nargs='*', default=None,
                        choices=sorted(MODELS),
                        help=f'subset of {sorted(MODELS)}; default: all')
    args = parser.parse_args()

    from femasr_tpu.utils.download_util import load_file_from_url
    for name in (args.models or list(MODELS)):
        url = MODELS[name]
        try:
            path = load_file_from_url(url)
            print(f'{name}: {path}')
        except FileNotFoundError as e:
            print(f'{name}: {e}')


if __name__ == '__main__':
    main()
