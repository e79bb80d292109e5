#!/usr/bin/env python
"""FeMaSR blind super-resolution CLI (TPU-native).

Same surface as the reference /root/reference/inference_femasr.py
(argparse -i -w -o -s --suffix --max_size, :22-29) plus TPU knobs
(--precision, --tile_size, --tile_pad, --tile_batch).

Example:
    python inference_femasr.py -s 4 -i ./testset -o results_x4/
"""

import argparse
import glob
import os
import time

import cv2
import numpy as np

pretrain_model_url = {
    'x4': 'https://github.com/chaofengc/FeMaSR/releases/download/v0.1-pretrain_models/FeMaSR_SRX4_model_g.pth',
    'x2': 'https://github.com/chaofengc/FeMaSR/releases/download/v0.1-pretrain_models/FeMaSR_SRX2_model_g.pth',
}


def main():
    parser = argparse.ArgumentParser(
        description='FeMaSR super-resolution (TPU-native JAX)')
    parser.add_argument('-i', '--input', type=str, default='./testset',
                        help='Input image file or folder')
    parser.add_argument('-w', '--weight', type=str, default=None,
                        help='Weight path: torch .pth (auto-converted) or flax .ckpt')
    parser.add_argument('-o', '--output', type=str, default='results',
                        help='Output folder')
    parser.add_argument('-s', '--out_scale', type=int, default=4,
                        help='SR scale: 2 or 4')
    parser.add_argument('--suffix', type=str, default='',
                        help='Suffix for restored filenames')
    parser.add_argument('--max_size', type=int, default=600,
                        help='Whole-image path if h*w < max_size^2, else tiled')
    parser.add_argument('--tile_size', type=int, default=240)
    parser.add_argument('--tile_pad', type=int, default=16)
    parser.add_argument('--tile_batch', type=int, default=None,
                        help='Tiles per batched forward (default: 1 on a '
                             'single device — v5e batch>=2 conv programs '
                             'compile to batch-interleaved layouts that '
                             'cost 1.7x the bytes per pixel, tiles chain '
                             'via lax.map instead; with --dp the default '
                             'is one tile per device)')
    parser.add_argument('--precision', type=str, default='bf16',
                        choices=['bf16', 'f32'],
                        help='Compute dtype on TPU (params stay f32)')
    parser.add_argument('--bucket', type=int, default=0,
                        help='>0: bucketed batched folder inference (pads '
                             'shapes to multiples of this; few compiles)')
    parser.add_argument('--dp', type=int, default=0,
                        help='>0: shard batches over a data-parallel mesh '
                             'of this many devices (multi-chip serving)')
    parser.add_argument('--tp', type=int, default=1,
                        help='tensor-parallel axis size (with --dp; splits '
                             'swin qkv/FFN + codebook over the mesh)')
    parser.add_argument('--ws2d_tail', action=argparse.BooleanOptionalAction,
                        default=None,
                        help='Pallas width-s2d decoder tail (round-5 '
                             'serving default for the gn+silu release '
                             'config; --no-ws2d_tail restores the XLA '
                             'tail). Exact math, checkpoint-compatible.')
    parser.add_argument('--int8_tail', action='store_true',
                        help='run the last decoder level + out_conv in w8a8 '
                             'int8 (2x MXU peak on v5e; checkpoint-free '
                             'dynamic quantization)')
    parser.add_argument('--int8_levels', type=int, default=1,
                        help='with --int8_tail: how many decoder levels '
                             '(from the output end) run int8 (1-3)')
    parser.add_argument('--int8_enc_up', action='store_true',
                        help='with --int8_tail: also quantize the LQ-encoder '
                             'up blocks (skips the pre-quantizer convs so '
                             'codebook indices stay float-exact)')
    parser.add_argument('--int8_swin', action='store_true',
                        help='quantize the swin qkv/proj/mlp linears w8a8 '
                             '(~96%% of the largest serving segment; may '
                             'flip near-tie codebook indices — same class '
                             'as bf16 serving divergence)')
    parser.add_argument('--fuse_chunks', action=argparse.BooleanOptionalAction,
                        default=None,
                        help='tiled mode: run ALL tile chunks inside one '
                             'jitted lax.map dispatch (default: auto — on '
                             'when single-device)')
    args = parser.parse_args()

    import jax.numpy as jnp

    from femasr_tpu.models.inference import load_inferencer
    from femasr_tpu.utils import imwrite, scandir
    from femasr_tpu.utils.download_util import load_file_from_url

    weight_path = args.weight
    if weight_path is None:
        weight_path = load_file_from_url(
            pretrain_model_url[f'x{args.out_scale}'])

    dtype = jnp.bfloat16 if args.precision == 'bf16' else jnp.float32
    mesh = None
    if args.dp > 0:
        from femasr_tpu.parallel.mesh import create_mesh
        mesh = create_mesh(data=args.dp, model=args.tp)
    if args.tile_batch is None:
        args.tile_batch = max(1, args.dp)  # one tile per data-parallel chip
    sr = load_inferencer(weight_path, scale_factor=args.out_scale,
                         dtype=dtype, max_tile_batch=args.tile_batch,
                         mesh=mesh, tensor_parallel=args.tp > 1,
                         ws2d_tail=args.ws2d_tail,
                         int8_tail=args.int8_tail,
                         int8_levels=args.int8_levels,
                         int8_enc_up=args.int8_enc_up,
                         int8_swin=args.int8_swin)

    os.makedirs(args.output, exist_ok=True)
    if os.path.isfile(args.input):
        paths = [args.input]
    else:
        paths = sorted(
            os.path.join(args.input, p)
            for p in scandir(args.input, recursive=True)
            if p.lower().endswith(('.png', '.jpg', '.jpeg', '.bmp', '.webp')))
    if not paths:
        raise SystemExit(f'No images found under {args.input}')

    def read_rgb(path):
        img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
        if img is None:
            return None
        if img.ndim == 2:
            img = cv2.cvtColor(img, cv2.COLOR_GRAY2BGR)
        if img.shape[2] == 4:
            img = img[:, :, :3]
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0

    def save(img_name, out):
        # img_name is the INPUT-RELATIVE path, so same-named files in
        # different subfolders cannot overwrite each other
        out_bgr = cv2.cvtColor(
            (np.clip(out, 0, 1) * 255.0).round().astype(np.uint8),
            cv2.COLOR_RGB2BGR)
        base, _ = os.path.splitext(img_name)
        suffix = f'_{args.suffix}' if args.suffix else ''
        imwrite(out_bgr, os.path.join(args.output, f'{base}{suffix}.png'))

    def rel_name(path):
        if os.path.isfile(args.input):
            return os.path.basename(path)
        return os.path.relpath(path, args.input)

    if args.bucket > 0:
        # bucketed batched mode: few XLA programs for a whole folder
        imgs, names = [], []
        for path in paths:
            rgb = read_rgb(path)
            if rgb is None:
                print(f'  ! cannot read {path}, skipping')
                continue
            imgs.append(rgb)
            names.append(rel_name(path))
        t0 = time.time()
        outs = sr.run_bucketed(imgs, bucket=args.bucket,
                               max_batch=args.tile_batch)
        dt = time.time() - t0
        for name, out in zip(names, outs):
            save(name, out)
        mp = sum(im.shape[0] * im.shape[1] for im in imgs) / 1e6
        print(f'{len(imgs)} images ({mp:.1f} MP input) in {dt:.1f}s '
              f'({mp / dt:.2f} MP/s incl. compile)', flush=True)
        return

    for idx, path in enumerate(paths):
        img_name = rel_name(path)
        print(f'[{idx + 1}/{len(paths)}] Processing: {img_name}', flush=True)
        rgb = read_rgb(path)
        if rgb is None:
            print(f'  ! cannot read {path}, skipping')
            continue

        t0 = time.time()
        out = sr(rgb, max_size=args.max_size, tile_size=args.tile_size,
                 tile_pad=args.tile_pad, fuse_chunks=args.fuse_chunks)
        dt = time.time() - t0
        save(img_name, out)
        mp = rgb.shape[0] * rgb.shape[1] / 1e6
        print(f'  {rgb.shape[1]}x{rgb.shape[0]} -> '
              f'{out.shape[1]}x{out.shape[0]} in {dt:.2f}s '
              f'({mp / dt:.2f} MP/s input)', flush=True)


if __name__ == '__main__':
    main()
