#!/usr/bin/env python
"""Offline LQ dataset synthesis with the BSRGAN degradation pipeline.

Capability parity with /root/reference/generate_dataset.py (:32-67): walks an
HQ tree, applies degradation_bsrgan(use_crop=False) and writes a mirrored
`LQ_sub_X{scale}` tree. Two execution modes:
  --device tpu   batched on-device synthesis (ops/degradations_jax.py)
  --device cpu   multiprocess host synthesis (reference behavior)

Usage:
    python generate_dataset.py -i ../datasets/HQ_sub -o ../datasets -s 4
"""

import argparse
import os
from functools import partial
from os import path as osp


def _degrade_one(path_pair, sf):
    import cv2
    import numpy as np

    from femasr_tpu.data.degradations import degradation_bsrgan
    src, dst = path_pair
    img = cv2.imread(src, cv2.IMREAD_COLOR)
    if img is None:
        return False
    rgb = cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.
    # bound the patch-size check by BOTH sides and never let one bad
    # image abort the whole Pool.map run
    lq_ps = min(rgb.shape[0], rgb.shape[1]) // sf // 2
    try:
        lq, _ = degradation_bsrgan(rgb, sf=sf, lq_patchsize=lq_ps,
                                   use_crop=False)
    except Exception as e:  # noqa: BLE001 — per-image isolation
        print(f'  ! skipping {src}: {type(e).__name__}: {e}', flush=True)
        return False
    os.makedirs(osp.dirname(dst), exist_ok=True)
    cv2.imwrite(dst, cv2.cvtColor((np.clip(lq, 0, 1) * 255).round().astype(
        'uint8'), cv2.COLOR_RGB2BGR))
    return True


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('-i', '--input', type=str, required=True,
                        help='HQ image tree (e.g. ../datasets/HQ_sub)')
    parser.add_argument('-o', '--output', type=str, required=True,
                        help='output parent dir (LQ_sub_X{scale} is created)')
    parser.add_argument('-s', '--scale', type=int, default=4)
    parser.add_argument('--device', choices=['cpu', 'tpu'], default='cpu')
    parser.add_argument('--nproc', type=int, default=os.cpu_count())
    parser.add_argument('--batch', type=int, default=8,
                        help='batch size for --device tpu')
    args = parser.parse_args()

    from femasr_tpu.data.data_util import make_dataset
    paths = make_dataset(args.input)
    out_root = osp.join(args.output, f'LQ_sub_X{args.scale}')
    pairs = [(p, osp.join(out_root, osp.relpath(p, args.input)))
             for p in paths]
    print(f'{len(pairs)} images -> {out_root}')

    if args.device == 'cpu':
        from multiprocessing import Pool
        with Pool(max(args.nproc, 1)) as pool:
            results = pool.map(partial(_degrade_one, sf=args.scale), pairs)
        print(f'done: {sum(results)}/{len(pairs)} converted')
        return

    # TPU path: batched jitted degradation (requires same-size HQ crops)
    import cv2
    import numpy as np

    import jax
    import jax.numpy as jnp

    from femasr_tpu.ops.degradations_jax import degradation_bsrgan_jax

    key = jax.random.PRNGKey(0)
    done = 0
    for i in range(0, len(pairs), args.batch):
        chunk = pairs[i:i + args.batch]
        imgs, dsts = [], []
        for src, dst in chunk:
            img = cv2.imread(src, cv2.IMREAD_COLOR)
            if img is None:
                continue
            imgs.append(cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
                        .astype(np.float32) / 255.)
            dsts.append(dst)
        if not imgs:
            continue
        shapes = {im.shape for im in imgs}
        assert len(shapes) == 1, ('--device tpu requires uniform HQ sizes '
                                  f'(got {shapes}); use extract_subimages first')
        key, sub = jax.random.split(key)
        lq, _ = degradation_bsrgan_jax(sub, jnp.asarray(np.stack(imgs)),
                                       sf=args.scale)
        lq = np.asarray(lq)
        for j, dst in enumerate(dsts):
            os.makedirs(osp.dirname(dst), exist_ok=True)
            cv2.imwrite(dst, cv2.cvtColor(
                (np.clip(lq[j], 0, 1) * 255).round().astype('uint8'),
                cv2.COLOR_RGB2BGR))
        done += len(dsts)
        print(f'{done}/{len(pairs)}', flush=True)


if __name__ == '__main__':
    main()
