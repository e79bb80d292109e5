#!/usr/bin/env python
"""Codebook visualization & index-statistics tool.

Capability parity with /root/reference/vis_codebook.py: (1) HQ-model
reconstruction of sample images with per-image code-index histograms,
(2) decoding the full codebook entry-by-entry into a texture grid,
(3) decoding random index maps into texture samples.

Usage:
    python vis_codebook.py -w hrp_model.pth -i ./samples -o vis_out/
"""

import argparse
import os
from os import path as osp

import cv2
import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('-w', '--weight', type=str, required=True,
                        help='HQ (HRP) model weights (.pth auto-converted or .ckpt)')
    parser.add_argument('-i', '--input', type=str, default=None,
                        help='optional folder of HQ images to reconstruct')
    parser.add_argument('-o', '--output', type=str, default='vis_codebook_out')
    parser.add_argument('--codebook_size', type=int, default=1024)
    parser.add_argument('--up_factor', type=int, default=2)
    parser.add_argument('--num_random_maps', type=int, default=8)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from femasr_tpu.models import FeMaSRNet
    from femasr_tpu.models.convert import merge_params
    from femasr_tpu.utils import imwrite, make_grid, scandir

    os.makedirs(args.output, exist_ok=True)

    model = FeMaSRNet(codebook_params=[[32, args.codebook_size, 512]],
                      LQ_stage=False, norm_type='gn', act_type='silu')
    init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

    if args.weight.endswith(('.pth', '.pt')):
        from femasr_tpu.models.convert import (convert_femasr_checkpoint,
                                               load_torch_checkpoint)
        sd = load_torch_checkpoint(args.weight)
        loaded = convert_femasr_checkpoint(
            sd, codebook_params=[[32, args.codebook_size, 512]],
            LQ_stage=False)
    else:
        from femasr_tpu.utils.checkpoint import load_pytree
        loaded = load_pytree(args.weight)
        loaded = loaded.get('params', loaded)
    params = merge_params(init['params'], loaded)

    decode = jax.jit(lambda p, idx: model.apply({'params': p}, idx,
                                                method='decode_indices'))

    # 1) full-codebook texture grid (vis_single_code parity)
    up = args.up_factor
    grids = []
    for start in range(0, args.codebook_size, 256):
        idx = jnp.arange(start, min(start + 256, args.codebook_size))
        idx = jnp.tile(idx.reshape(-1, 1, 1), (1, up, up))
        grids.append(np.asarray(decode(params, idx)))
    imgs = np.concatenate(grids, axis=0)
    grid = make_grid(np.clip(imgs, 0, 1), nrow=32)
    imwrite(cv2.cvtColor((grid * 255).astype(np.uint8), cv2.COLOR_RGB2BGR),
            osp.join(args.output, 'codebook_grid.png'))
    print(f'wrote codebook_grid.png ({args.codebook_size} entries)')

    # 2) random index maps -> texture samples
    rng = np.random.default_rng(0)
    rand_idx = rng.integers(0, args.codebook_size,
                            (args.num_random_maps, 8, 8))
    out = np.asarray(decode(params, jnp.asarray(rand_idx)))
    grid = make_grid(np.clip(out, 0, 1), nrow=4)
    imwrite(cv2.cvtColor((grid * 255).astype(np.uint8), cv2.COLOR_RGB2BGR),
            osp.join(args.output, 'random_index_textures.png'))
    print('wrote random_index_textures.png')

    # 3) reconstructions + index histograms for provided images
    if args.input:
        recon = jax.jit(lambda p, x: model.apply({'params': p}, x))
        for rel in sorted(scandir(args.input)):
            path = osp.join(args.input, rel)
            img = cv2.imread(path, cv2.IMREAD_COLOR)
            if img is None:
                continue
            rgb = cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.
            h = (rgb.shape[0] // 64) * 64
            w = (rgb.shape[1] // 64) * 64
            if h == 0 or w == 0:
                continue
            x = jnp.asarray(rgb[:h, :w])[None]
            rec, _, _, idx_list = recon(params, x)
            base = osp.splitext(osp.basename(rel))[0]
            imwrite(cv2.cvtColor(
                (np.clip(np.asarray(rec[0]), 0, 1) * 255).astype(np.uint8),
                cv2.COLOR_RGB2BGR), osp.join(args.output, f'{base}_rec.png'))
            hist = np.bincount(np.asarray(idx_list[0]).reshape(-1),
                               minlength=args.codebook_size)
            np.savetxt(osp.join(args.output, f'{base}_code_hist.txt'), hist,
                       fmt='%d')
            used = int((hist > 0).sum())
            print(f'{base}: reconstructed; {used}/{args.codebook_size} codes used')


if __name__ == '__main__':
    main()
