#!/usr/bin/env python
"""Precompute FID feature statistics (mu, sigma) for a dataset folder.

Parity: /root/reference/scripts/metrics/calculate_fid_stats_from_datasets.py
(broken in the reference — imports the missing basicsr.metrics.fid). Saves
an .npz with mu/sigma that scripts/metrics/calculate_fid.py accepts in
place of a folder, so the reference-dataset pass runs once.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir, os.pardir))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('folder', type=str)
    parser.add_argument('-o', '--output', type=str, required=True,
                        help='Output .npz path (keys: mu, sigma)')
    parser.add_argument('--inception_weights', type=str, default=None,
                        help='pt_inception .pth -> canonical FID stats')
    parser.add_argument('--vgg_weights', type=str, default=None,
                        help='torchvision vgg16 .pth -> non-canonical')
    parser.add_argument('--batch_size', type=int, default=8)
    args = parser.parse_args()

    from femasr_tpu.metrics.fid import (extract_features, feature_statistics,
                                        vgg_feature_fn)
    from femasr_tpu.models.convert import load_torch_checkpoint

    if args.inception_weights:
        from femasr_tpu.metrics.inception import (
            convert_inception_checkpoint, inception_feature_fn)
        sd = load_torch_checkpoint(args.inception_weights, param_key=None)
        fn = inception_feature_fn(convert_inception_checkpoint(sd))
        backbone = 'inception_v3_pool3'
    elif args.vgg_weights:
        from femasr_tpu.models.vgg_arch import convert_vgg_checkpoint
        sd = load_torch_checkpoint(args.vgg_weights, param_key=None)
        fn = vgg_feature_fn(convert_vgg_checkpoint(sd, 'vgg16'))
        backbone = 'vgg16_relu5_3'
    else:
        parser.error('pass --inception_weights (canonical) or --vgg_weights')

    feats = extract_features(args.folder, fn, args.batch_size)
    mu, sigma = feature_statistics(feats)
    np.savez(args.output, mu=mu, sigma=sigma,
             backbone=np.array(backbone), n=np.array(len(feats)))
    print(f'saved stats for {len(feats)} images ({backbone}) '
          f'-> {args.output}')


if __name__ == '__main__':
    main()
