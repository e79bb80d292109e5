#!/usr/bin/env python
"""Real two-stage training smoke on live hardware (VERDICT.md round-1 #5).

Runs the ACTUAL train_pipeline twice on real images (the reference's bundled
testset), asserting the dynamics the reference trainer exhibits
(/root/reference/basicsr/models/femasr_model.py:137-215):

  stage 1 (HQ pretrain): VQGAN autoencoder, BSRGAN host degradation path,
      full-size [[32, 1024, 512]] codebook, GAN on.
  stage 2 (LQ SR): frozen HQ prior loaded from stage 1's checkpoint,
      gt-indices supervision, ON-DEVICE degradation synthesis, GAN on.
  stage 2b: --auto_resume from stage 2's saved training state.

Asserts: every logged loss finite; |l_g_gan| and |out_d_*| sane at init
(the spectral-norm warm start keeps D outputs O(1), not the 3e13 of a
cold power iteration); resume actually restores the saved iteration.

Usage: python scripts/train_smoke.py [--iters N] [--batch B] [--root DIR]
Writes a summary to <root>/SMOKE_SUMMARY.txt and prints it.
"""
import argparse
import glob
import json
import os
import re
import shutil
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

STAGE1_YML = """
name: smoke_hq_stage
model_type: FeMaSRModel
scale: 4
num_gpu: 1
manual_seed: 0
datasets:
  train:
    name: smoke_train
    type: BSRGANTrainDataset
    dataroot_gt: {data}
    io_backend: {{type: disk}}
    gt_size: 256
    use_resize_crop: true
    use_flip: true
    use_rot: true
    use_shuffle: true
    batch_size_per_gpu: {batch}
    num_worker_per_gpu: 2
    dataset_enlarge_ratio: 1
network_g:
  type: FeMaSRNet
  gt_resolution: 256
  norm_type: 'gn'
  act_type: 'silu'
  use_semantic_loss: false
  codebook_params:
    - [32, 1024, 512]
  LQ_stage: false
  use_quantize: true
network_d: {{type: UNetDiscriminatorSN, num_in_ch: 3}}
path: {{strict_load: false}}
train:
  optim_g: {{type: Adam, lr: !!float 1e-4, weight_decay: 0, betas: [0.9, 0.99]}}
  optim_d: {{type: Adam, lr: !!float 4e-4, weight_decay: 0, betas: [0.9, 0.99]}}
  scheduler: {{type: MultiStepLR, milestones: [50000], gamma: 1}}
  total_iter: {iters}
  warmup_iter: -1
  pixel_opt: {{type: L1Loss, loss_weight: 1.0, reduction: mean}}
  gan_opt: {{type: GANLoss, gan_type: hinge, real_label_val: 1.0,
            fake_label_val: 0.0, loss_weight: 0.1}}
  codebook_opt: {{loss_weight: 1.0}}
  net_d_iters: 1
  net_d_init_iters: !!float 0
val: ~
logger: {{print_freq: 1, save_checkpoint_freq: {save_freq},
          use_tb_logger: false}}
"""

STAGE2_YML = """
name: smoke_lq_stage
model_type: FeMaSRModel
scale: 4
num_gpu: 1
manual_seed: 0
datasets:
  train:
    name: smoke_train
    type: BSRGANTrainDataset
    dataroot_gt: {data}
    on_device_degradation: true
    io_backend: {{type: disk}}
    gt_size: 256
    use_resize_crop: true
    use_flip: true
    use_rot: true
    use_shuffle: true
    batch_size_per_gpu: {batch}
    num_worker_per_gpu: 2
    dataset_enlarge_ratio: 1
network_g:
  type: FeMaSRNet
  gt_resolution: 256
  norm_type: 'gn'
  act_type: 'silu'
  codebook_params:
    - [32, 1024, 512]
  LQ_stage: true
  scale_factor: 4
  frozen_module_keywords: ['quantize', 'decoder', 'after_quant_group', 'out_conv']
network_d: {{type: UNetDiscriminatorSN, num_in_ch: 3}}
path:
  pretrain_network_hq: {hq_ckpt}
  strict_load: false
train:
  optim_g: {{type: Adam, lr: !!float 1e-4, weight_decay: 0, betas: [0.9, 0.99]}}
  optim_d: {{type: Adam, lr: !!float 4e-4, weight_decay: 0, betas: [0.9, 0.99]}}
  scheduler: {{type: MultiStepLR, milestones: [50000], gamma: 1}}
  total_iter: {iters}
  warmup_iter: -1
  pixel_opt: {{type: L1Loss, loss_weight: 1.0, reduction: mean}}
  gan_opt: {{type: GANLoss, gan_type: hinge, real_label_val: 1.0,
            fake_label_val: 0.0, loss_weight: 0.1}}
  codebook_opt: {{loss_weight: 1.0}}
  net_d_iters: 1
  net_d_init_iters: !!float 0
val: ~
logger: {{print_freq: 1, save_checkpoint_freq: {save_freq},
          use_tb_logger: false}}
"""

LOSS_RE = re.compile(r'(l_[a-z_]+|out_d_[a-z]+|codebook_perplexity): '
                     r'([-+]?(?:\d+\.?\d*(?:e[-+]?\d+)?|nan|inf))')


def run_stage(root, yml_text, name, extra_args=()):
    yml_path = os.path.join(root, f'{name}.yml')
    with open(yml_path, 'w') as f:
        f.write(yml_text)
    code = ('import sys; sys.path.insert(0, %r); '
            'from femasr_tpu.train.pipeline import train_pipeline; '
            'train_pipeline(%r, argv=sys.argv[1:])' % (HERE, root))
    env = dict(os.environ)
    env['JAX_COMPILATION_CACHE_DIR'] = os.path.expanduser(
        '~/.cache/femasr_tpu/jax_cache')
    proc = subprocess.run(
        [sys.executable, '-c', code, '-opt', yml_path, *extra_args],
        cwd=root, env=env, capture_output=True, text=True, timeout=3000)
    if proc.returncode != 0:
        sys.stderr.write(proc.stdout[-3000:])
        sys.stderr.write(proc.stderr[-3000:])
        raise RuntimeError(f'{name} failed rc={proc.returncode}')
    return proc


def parse_losses(root, exp_name):
    logs = sorted(glob.glob(
        os.path.join(root, 'experiments', exp_name, '*.log')))
    rows = []
    for lf in logs:
        with open(lf) as f:
            for line in f:
                found = dict((k, float(v)) for k, v in LOSS_RE.findall(line))
                if 'l_g_total' in found:   # real iteration lines only
                    rows.append(found)
    return rows


def check(rows, stage, summary):
    import math
    assert rows, f'{stage}: no loss lines logged'
    bad = [r for r in rows for v in r.values() if not math.isfinite(v)]
    assert not bad, f'{stage}: non-finite losses: {bad[:3]}'
    first, last = rows[0], rows[-1]
    for k in ('l_g_gan', 'out_d_real', 'out_d_fake'):
        if k in first:
            assert abs(first[k]) < 1e4, \
                f'{stage}: |{k}|={first[k]:.3g} at init (SN warm start broken?)'
    summary.append(f'{stage}: {len(rows)} logged iters, first={first}')
    summary.append(f'{stage}: last={last}')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters', type=int, default=40)
    ap.add_argument('--batch', type=int, default=2)
    ap.add_argument('--root', type=str, default='/tmp/femasr_train_smoke')
    args = ap.parse_args()

    root = args.root
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    data = os.path.join(root, 'hq')
    os.makedirs(data)
    # real images from the reference's bundled testset, upscaled where
    # smaller than the 256px training crop (the reference trains on 512px
    # HQ_sub crops; some testset images are ~120px)
    import cv2
    src = '/root/reference/testset'
    for name in sorted(os.listdir(src))[:10]:
        img = cv2.imread(os.path.join(src, name))
        if img is None:
            continue
        h, w = img.shape[:2]
        if min(h, w) < 512:
            s = 512 / min(h, w)
            img = cv2.resize(img, (int(w * s) + 1, int(h * s) + 1),
                             interpolation=cv2.INTER_CUBIC)
        # square 512 center crop: the BSRGAN dataset derives its random
        # resize factor from the height alone, exactly like the reference
        # (bsrgan_train_dataset.py:60-66), which presumes square HQ_sub crops
        h, w = img.shape[:2]
        top, left = (h - 512) // 2, (w - 512) // 2
        img = img[top:top + 512, left:left + 512]
        cv2.imwrite(os.path.join(data, os.path.splitext(name)[0] + '.png'),
                    img)

    summary = []
    save_freq = max(args.iters // 2, 1)

    run_stage(root, STAGE1_YML.format(data=data, batch=args.batch,
                                      iters=args.iters, save_freq=save_freq),
              'stage1_hq')
    check(parse_losses(root, 'smoke_hq_stage'), 'stage1-HQ', summary)
    hq_ckpt = os.path.join(root, 'experiments', 'smoke_hq_stage', 'models',
                           'net_g_latest.ckpt')
    assert os.path.exists(hq_ckpt), f'missing {hq_ckpt}'

    yml2 = STAGE2_YML.format(data=data, batch=args.batch, iters=args.iters,
                             hq_ckpt=hq_ckpt, save_freq=save_freq)
    run_stage(root, yml2, 'stage2_lq')
    rows2 = parse_losses(root, 'smoke_lq_stage')
    check(rows2, 'stage2-LQ', summary)

    # stage 2b: resume from the saved state for a few more iterations
    yml2b = yml2.replace(f'total_iter: {args.iters}',
                         f'total_iter: {args.iters + save_freq}')
    proc = run_stage(root, yml2b, 'stage2b_resume', ('--auto_resume',))
    logs = glob.glob(os.path.join(root, 'experiments', 'smoke_lq_stage',
                                  '*.log'))
    resumed = any('Resuming training from' in open(lf).read() for lf in logs)
    assert resumed, 'stage2b did not resume from the saved training state'
    rows2b = parse_losses(root, 'smoke_lq_stage')
    assert len(rows2b) > len(rows2), 'no new iterations after resume'
    summary.append(f'stage2b-resume: OK (+{len(rows2b) - len(rows2)} iters '
                   'after restoring optimizer/scheduler state)')
    del proc

    text = '\n'.join(summary)
    with open(os.path.join(root, 'SMOKE_SUMMARY.txt'), 'w') as f:
        f.write(text + '\n')
    print(text)
    print('TRAIN SMOKE OK')


if __name__ == '__main__':
    main()
