#!/usr/bin/env python
"""FID between two image folders.

Parity: /root/reference/scripts/metrics/calculate_fid_folder.py (broken in
the reference — missing basicsr.archs.inception). Feature backbone: converted
VGG16 (--vgg_weights, torchvision vgg16 .pth) pooled at relu5_3; InceptionV3
weights are not redistributable in this environment.
"""

import argparse


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('folder1', type=str)
    parser.add_argument('folder2', type=str)
    parser.add_argument('--vgg_weights', type=str, required=True)
    parser.add_argument('--batch_size', type=int, default=8)
    args = parser.parse_args()

    from femasr_tpu.metrics.fid import calculate_fid, vgg_feature_fn
    from femasr_tpu.models.convert import load_torch_checkpoint
    from femasr_tpu.models.vgg_arch import convert_vgg_checkpoint

    sd = load_torch_checkpoint(args.vgg_weights, param_key=None)
    params = convert_vgg_checkpoint(sd, 'vgg16')
    fid = calculate_fid(args.folder1, args.folder2,
                        vgg_feature_fn(params), args.batch_size)
    print(f'FID: {fid:.4f}')


if __name__ == '__main__':
    main()
