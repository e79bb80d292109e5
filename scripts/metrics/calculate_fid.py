#!/usr/bin/env python
"""FID between two image folders.

Parity: /root/reference/scripts/metrics/calculate_fid_folder.py (broken in
the reference — it imports the missing basicsr.archs.inception). Canonical
backbone: InceptionV3 pool3 (pytorch-fid variant,
femasr_tpu/metrics/inception.py) with --inception_weights pointing at
pt_inception-2015-12-05-6726825d.pth (or a torchvision inception_v3
state_dict). Fallback backbone: converted torchvision VGG16 pooled at
relu5_3 via --vgg_weights (numbers NOT comparable to literature FID).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir, os.pardir))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('folder1', type=str,
                        help='image folder, or stats .npz from '
                             'calculate_fid_stats.py')
    parser.add_argument('folder2', type=str,
                        help='image folder, or stats .npz')
    parser.add_argument('--inception_weights', type=str, default=None,
                        help='pt_inception .pth -> canonical FID')
    parser.add_argument('--vgg_weights', type=str, default=None,
                        help='torchvision vgg16 .pth -> non-canonical FID')
    parser.add_argument('--batch_size', type=int, default=8)
    args = parser.parse_args()

    from femasr_tpu.metrics.fid import calculate_fid, vgg_feature_fn
    from femasr_tpu.models.convert import load_torch_checkpoint

    if args.inception_weights:
        from femasr_tpu.metrics.inception import (
            convert_inception_checkpoint, inception_feature_fn)
        sd = load_torch_checkpoint(args.inception_weights, param_key=None)
        fn = inception_feature_fn(convert_inception_checkpoint(sd))
        label = 'FID(InceptionV3-pool3)'
    elif args.vgg_weights:
        from femasr_tpu.models.vgg_arch import convert_vgg_checkpoint
        sd = load_torch_checkpoint(args.vgg_weights, param_key=None)
        fn = vgg_feature_fn(convert_vgg_checkpoint(sd, 'vgg16'))
        label = 'FID(vgg16-relu5_3, non-canonical)'
    else:
        parser.error('pass --inception_weights (canonical) or --vgg_weights')

    fid = calculate_fid(args.folder1, args.folder2, fn, args.batch_size)
    print(f'{label}: {fid:.4f}')


if __name__ == '__main__':
    main()
