#!/usr/bin/env python
"""One-command quality-parity suite: BASELINE configs 1-5 end-to-end.

Runs the full PARITY.md runbook against a directory of released weights:

  1. x4 testset inference  -> PSNR/SSIM vs the committed reference outputs
     (/root/reference/results_x4, inference_femasr.py:13-16,33-41)
  2. x2 inference + forced tiled path (batched-tile halo engine)
  3. codebook visualization on the HRP checkpoint (vis_codebook.py parity)
  4. codebook index-fidelity pytest vs the reference torch implementation
     (FEMASR_REAL_WEIGHTS pickup in tests/test_parity_ops.py)
  5. DIV2K-val x4 LPIPS (reference README.md:18: 0.329) via test.py

Usage (real weights, see PARITY.md for the fetch list):
    python scripts/run_parity_suite.py --weights_dir ~/.cache/femasr_tpu/weights \
        --div2k_lq <DIV2K_valid_LRx4> --div2k_gt <DIV2K_valid_HR_mod16> \
        --lpips_weights <LPIPS-vgg .pth>

Offline dry-run (generates shim stand-in weights + tiny images, exercises
every command end-to-end; metric VALUES are meaningless with random
weights — the point is that the flow runs):
    python scripts/run_parity_suite.py --dryrun --out /tmp/parity_dryrun
"""

import argparse
import os
import subprocess
import sys
from os import path as osp

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)

WEIGHT_FILES = {
    'x4': 'FeMaSR_SRX4_model_g.pth',
    'x2': 'FeMaSR_SRX2_model_g.pth',
    'hrp': 'FeMaSR_HRP_model_g.pth',
}


def run(cmd, env_extra=None, desc=''):
    print(f'\n=== {desc or " ".join(map(str, cmd))}', flush=True)
    env = dict(os.environ)
    if env_extra:
        env.update(env_extra)
    r = subprocess.run([str(c) for c in cmd], cwd=REPO, env=env)
    if r.returncode != 0:
        raise SystemExit(f'FAILED ({r.returncode}): {" ".join(map(str, cmd))}')


def make_dryrun_fixtures(out_dir: str, small: bool, needed=None):
    """Generate stand-in release weights (reference torch archs, random
    init, exact release key/shape layout) + tiny test images.

    `needed`: optional subset of {'x4','x2','hrp','lpips'} to generate
    (configs being skipped don't pay for their weights)."""
    import cv2
    import numpy as np
    import torch

    sys.path.insert(0, osp.join(REPO, 'tests'))
    from reference_shim import load_reference_module
    femasr_arch = load_reference_module('basicsr.archs.femasr_arch')

    needed = set(needed) if needed is not None else {'x4', 'x2', 'hrp',
                                                     'lpips'}
    wdir = osp.join(out_dir, 'weights')
    os.makedirs(wdir, exist_ok=True)
    torch.manual_seed(0)
    specs = {'x4': dict(LQ_stage=True, scale_factor=4),
             'x2': dict(LQ_stage=True, scale_factor=2),
             'hrp': dict(LQ_stage=False, scale_factor=1)}
    for key, kw in specs.items():
        path = osp.join(wdir, WEIGHT_FILES[key])
        if key not in needed or osp.exists(path):
            continue
        net = femasr_arch.FeMaSRNet(codebook_params=[[32, 1024, 512]],
                                    gt_resolution=256, norm_type='gn',
                                    act_type='silu', **kw)
        torch.save({'params': net.state_dict()}, path)
        print(f'[dryrun] wrote stand-in {path}')

    # stand-in LPIPS checkpoint in the lpips-package layout the converter
    # accepts (lin heads + embedded vgg16 slices)
    lpips_path = osp.join(wdir, 'LPIPS_vgg_standin.pth')
    if 'lpips' in needed and not osp.exists(lpips_path):
        from femasr_tpu.losses.lpips import LPIPS_VGG_CHANNELS
        from femasr_tpu.models.vgg_arch import VGG_CFGS
        sd = {}
        for i, c in enumerate(LPIPS_VGG_CHANNELS):
            sd[f'lin{i}.model.1.weight'] = torch.rand(1, c, 1, 1) / c
        # vgg16 backbone as torchvision features.* keys via net.slice form
        tv_idx = 0
        in_c = 3
        for v in VGG_CFGS['vgg16']:
            if v == 'M':
                tv_idx += 1
                continue
            sd[f'net.slice0.{tv_idx}.weight'] = (
                torch.randn(v, in_c, 3, 3) * 0.05)
            sd[f'net.slice0.{tv_idx}.bias'] = torch.zeros(v)
            in_c = v
            tv_idx += 2  # conv + relu
        torch.save(sd, lpips_path)
        print(f'[dryrun] wrote stand-in {lpips_path}')

    # tiny inputs: "testset" (2 small LR images) + DIV2K-like pairs
    rng = np.random.default_rng(0)
    tdir = osp.join(out_dir, 'testset')
    os.makedirs(tdir, exist_ok=True)
    sz = 24 if small else 48
    for i in range(2):
        img = (rng.random((sz, sz, 3)) * 255).astype(np.uint8)
        cv2.imwrite(osp.join(tdir, f'img{i}.png'), img)

    lq_dir = osp.join(out_dir, 'div2k', 'lrx4')
    gt_dir = osp.join(out_dir, 'div2k', 'gt_mod16')
    os.makedirs(lq_dir, exist_ok=True)
    os.makedirs(gt_dir, exist_ok=True)
    for i in range(2):
        lq = (rng.random((sz, sz, 3)) * 255).astype(np.uint8)
        gt = cv2.resize(lq, (sz * 4, sz * 4), interpolation=cv2.INTER_CUBIC)
        cv2.imwrite(osp.join(lq_dir, f'v{i}.png'), lq)
        cv2.imwrite(osp.join(gt_dir, f'v{i}.png'), gt)
    return wdir, tdir, lq_dir, gt_dir, lpips_path


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--weights_dir',
                   default=osp.expanduser('~/.cache/femasr_tpu/weights'))
    p.add_argument('--testset', default='/root/reference/testset')
    p.add_argument('--ref_results', default='/root/reference/results_x4',
                   help='committed reference x4 outputs to compare against')
    p.add_argument('--div2k_lq', default=None)
    p.add_argument('--div2k_gt', default=None)
    p.add_argument('--lpips_weights', default=None)
    p.add_argument('--out', default='/tmp/femasr_parity')
    p.add_argument('--precision', default='f32', choices=['f32', 'bf16'],
                   help='f32 for max agreement with the fp32 reference')
    p.add_argument('--dryrun', action='store_true',
                   help='generate stand-in weights + tiny images; '
                        'validates the flow, not the numbers')
    p.add_argument('--skip', default='',
                   help='comma-separated config ids to skip, e.g. 4,5')
    args = p.parse_args()

    skip = set(args.skip.split(',')) if args.skip else set()
    os.makedirs(args.out, exist_ok=True)
    py = sys.executable

    needed = set()
    if '1' not in skip:
        needed.add('x4')
    if '2' not in skip:
        needed.add('x2')
    if '3' not in skip:
        needed.add('hrp')
    if '5' not in skip:
        needed.update({'x4', 'lpips'})

    ref_results = args.ref_results
    if args.dryrun:
        (args.weights_dir, args.testset, args.div2k_lq, args.div2k_gt,
         args.lpips_weights) = make_dryrun_fixtures(args.out, small=True,
                                                    needed=needed)
        # with random weights there are no committed reference outputs;
        # compare the x4 run against itself (checks the metric plumbing)
        ref_results = osp.join(args.out, 'ours_x4')

    w = {k: osp.join(args.weights_dir, v) for k, v in WEIGHT_FILES.items()}
    missing = [w[k] for k in sorted(needed - {'lpips'})
               if not osp.exists(w[k])]
    if missing:
        raise SystemExit('missing weights (see PARITY.md fetch list):\n  '
                         + '\n  '.join(missing))

    if '1' not in skip:  # config 1: x4 vs committed reference outputs
        out_x4 = osp.join(args.out, 'ours_x4')
        run([py, 'inference_femasr.py', '-s', 4, '-i', args.testset,
             '-o', out_x4, '-w', w['x4'], '--precision', args.precision],
            desc='config 1a: x4 testset inference')
        run([py, 'scripts/metrics/calculate_psnr_ssim.py',
             '--gt', ref_results, '--restored', out_x4, '--crop_border', 0],
            desc='config 1b: PSNR/SSIM vs reference x4 outputs')

    if '2' not in skip:  # config 2: x2 + forced tiled path
        out_x2 = osp.join(args.out, 'ours_x2_tiled')
        tile_args = (['--max_size', 16, '--tile_size', 16, '--tile_pad', 8]
                     if args.dryrun else ['--max_size', 100])
        run([py, 'inference_femasr.py', '-s', 2, '-i', args.testset,
             '-o', out_x2, '-w', w['x2'], '--precision', args.precision]
            + tile_args,
            desc='config 2: x2 inference, tiled-path forced')

    if '3' not in skip:  # config 3a: HRP codebook visualization
        run([py, 'vis_codebook.py', '-w', w['hrp'],
             '-o', osp.join(args.out, 'vis_codebook')],
            desc='config 3: HRP codebook decode grid')

    if '4' not in skip:  # config 3b/4: index fidelity vs reference torch
        run([py, '-m', 'pytest', 'tests/test_parity_ops.py', '-q',
             '-k', 'quantizer'],
            env_extra={'FEMASR_REAL_WEIGHTS': args.weights_dir,
                       'JAX_PLATFORMS': 'cpu'},
            desc='config 4: codebook index parity vs reference torch')

    if '5' not in skip:  # config 5: DIV2K-val x4 LPIPS (target 0.329)
        if not (args.div2k_lq and args.div2k_gt):
            print('config 5 SKIPPED: pass --div2k_lq/--div2k_gt')
        else:
            cmd = [py, 'test.py', '-opt', 'options/test_FeMaSR.yml',
                   '--force_yml', f'datasets:test_1:dataroot_lq={args.div2k_lq}',
                   '--force_yml', f'datasets:test_1:dataroot_gt={args.div2k_gt}',
                   '--force_yml', f'path:pretrain_network_g={w["x4"]}']
            if args.lpips_weights:
                cmd += ['--force_yml',
                        f'path:pretrain_lpips={args.lpips_weights}']
            run(cmd, desc='config 5: DIV2K-val x4 eval (LPIPS target 0.329)')

    print('\nparity suite complete; outputs under', args.out)


if __name__ == '__main__':
    main()
