#!/usr/bin/env python
"""Bidirectional checkpoint converter: reference torch .pth <-> flax .ckpt.

Parity: /root/reference/scripts/model_conversion/* (BasicSR checkpoint
converters). Forward direction loads any released FeMaSR / discriminator /
SwinIR .pth; reverse direction exports a flax .ckpt back to the reference
key layout so reference-side tools can consume our training results.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir, os.pardir))


def torch_to_flax(args):
    from femasr_tpu.models.convert import (convert_discriminator_checkpoint,
                                           convert_femasr_checkpoint,
                                           load_torch_checkpoint)
    from femasr_tpu.utils.checkpoint import save_pytree

    sd = load_torch_checkpoint(args.input)
    if args.net == 'femasr':
        params = convert_femasr_checkpoint(
            sd, codebook_params=[[32, args.codebook_size, 512]],
            LQ_stage=args.lq_stage, scale_factor=args.scale)
        save_pytree({'params': params}, args.output)
    elif args.net == 'discriminator':
        params, spectral = convert_discriminator_checkpoint(sd)
        save_pytree({'params': params, 'spectral': spectral}, args.output)
    elif args.net == 'swinir':
        from femasr_tpu.models.swinir_arch import convert_swinir_checkpoint
        params = convert_swinir_checkpoint(sd, upsampler=args.upsampler)
        save_pytree({'params': params}, args.output)
    print(f'wrote {args.output}')


def flax_to_torch(args):
    import numpy as np

    from femasr_tpu.models.convert import femasr_param_mapping
    from femasr_tpu.utils.checkpoint import load_pytree
    from flax.traverse_util import flatten_dict

    tree = load_pytree(args.input)
    params = tree.get('params', tree)
    flat = flatten_dict(params)

    mapping = femasr_param_mapping(
        codebook_params=[[32, args.codebook_size, 512]],
        LQ_stage=args.lq_stage, scale_factor=args.scale)

    import torch
    sd = {}
    for flax_path, (torch_key, transform) in mapping.items():
        if flax_path not in flat:
            continue
        arr = np.asarray(flat[flax_path])
        if transform.__name__ == '_conv_w':
            arr = arr.transpose(3, 2, 0, 1)
        elif transform.__name__ == '_lin_w':
            arr = arr.T
        sd[torch_key] = torch.from_numpy(np.ascontiguousarray(arr))
    torch.save({'params': sd}, args.output)
    print(f'wrote {args.output} ({len(sd)} tensors, reference key layout)')


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('-i', '--input', required=True)
    parser.add_argument('-o', '--output', required=True)
    parser.add_argument('--net', default='femasr',
                        choices=['femasr', 'discriminator', 'swinir'])
    parser.add_argument('--lq_stage', action='store_true')
    parser.add_argument('--scale', type=int, default=4)
    parser.add_argument('--codebook_size', type=int, default=1024)
    parser.add_argument('--upsampler', default='')
    args = parser.parse_args()

    if args.input.endswith(('.pth', '.pt')):
        torch_to_flax(args)
    else:
        flax_to_torch(args)


if __name__ == '__main__':
    main()
