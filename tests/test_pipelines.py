"""End-to-end pipeline smokes: offline evaluation (test.py) and metric CLIs."""

import os
import subprocess
import sys
from os import path as osp

import cv2
import numpy as np
import pytest

REPO = osp.abspath(osp.join(osp.dirname(__file__), '..'))


@pytest.fixture(scope='module')
def eval_data(tmp_path_factory):
    root = tmp_path_factory.mktemp('eval_data')
    gt_dir = root / 'gt'
    lq_dir = root / 'lq'
    gt_dir.mkdir()
    lq_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        gt = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(gt_dir / f'im{i}.png'), gt)
        cv2.imwrite(str(lq_dir / f'im{i}.png'), cv2.resize(gt, (16, 16)))
    return root


def test_offline_eval_pipeline(eval_data, tmp_path):
    """test.py: build model from YAML, validate over a test set, save images
    + metrics (reference basicsr/test.py:11-45 flow)."""
    from femasr_tpu.train.pipeline import test_pipeline

    cfg = f"""
name: smoke_test_eval
model_type: FeMaSRModel
scale: 4
num_gpu: 1
manual_seed: 0
datasets:
  test_1:
    name: tiny_test
    type: PairedImageDataset
    dataroot_gt: {eval_data}/gt
    dataroot_lq: {eval_data}/lq
    io_backend: {{type: disk}}
network_g:
  type: FeMaSRNet
  gt_resolution: 256
  norm_type: 'gn'
  act_type: 'silu'
  scale_factor: 4
  codebook_params:
    - [32, 64, 64]
  LQ_stage: true
network_d: {{type: UNetDiscriminatorSN, num_in_ch: 3}}
path: {{strict_load: false}}
val:
  save_img: true
  suffix: ~
  key_metric: psnr
  metrics:
    psnr: {{type: psnr, crop_border: 4, test_y_channel: true}}
    ssim: {{type: ssim, crop_border: 4, test_y_channel: true}}
logger: {{use_tb_logger: false}}
"""
    opt_path = tmp_path / 'test_opt.yml'
    opt_path.write_text(cfg)
    model = test_pipeline(str(tmp_path), argv=['-opt', str(opt_path)])
    assert 'psnr' in model.metric_results
    assert np.isfinite(model.metric_results['psnr'])
    vis = tmp_path / 'results' / 'smoke_test_eval' / 'visualization' / 'tiny_test'
    saved = list(vis.glob('*.png'))
    assert len(saved) == 2
    img = cv2.imread(str(saved[0]))
    assert img.shape == (64, 64, 3)


def test_metric_cli_scripts(eval_data, tmp_path):
    """scripts/metrics/calculate_psnr_ssim.py end-to-end via subprocess."""
    restored = tmp_path / 'restored'
    restored.mkdir()
    rng = np.random.default_rng(1)
    for p in (eval_data / 'gt').glob('*.png'):
        img = cv2.imread(str(p))
        noisy = np.clip(img.astype(np.int32)
                        + rng.integers(-10, 10, img.shape), 0, 255)
        cv2.imwrite(str(restored / p.name), noisy.astype(np.uint8))

    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS='cpu')
    out = subprocess.run(
        [sys.executable, osp.join(REPO, 'scripts/metrics/calculate_psnr_ssim.py'),
         '--gt', str(eval_data / 'gt'), '--restored', str(restored),
         '--crop_border', '4', '--test_y_channel'],
        capture_output=True, text=True, env=env, timeout=240)
    assert out.returncode == 0, out.stderr[-500:]
    assert 'Average: PSNR:' in out.stdout


def test_sharded_validation_matches_single_device(eval_data, tmp_path):
    """dist_validation shards forwards over the 8-device 'data' mesh axis and
    must produce the same metrics as the single-device path (replaces the
    reference's "Only support single GPU validation" fall-through,
    femasr_model.py:229-232)."""
    from femasr_tpu.data.loader import build_dataloader, build_dataset
    from femasr_tpu.train import build_model
    from femasr_tpu.utils.options import yaml_load

    opt = yaml_load(f"""
name: shard_val
model_type: FeMaSRModel
scale: 4
num_gpu: 8
manual_seed: 0
is_train: false
dist: true
rank: 0
world_size: 1
datasets:
  test_1:
    name: tiny_test
    phase: test
    scale: 4
    type: PairedImageDataset
    dataroot_gt: {eval_data}/gt
    dataroot_lq: {eval_data}/lq
    io_backend: {{type: disk}}
network_g:
  type: FeMaSRNet
  gt_resolution: 256
  norm_type: 'gn'
  act_type: 'silu'
  scale_factor: 4
  codebook_params:
    - [32, 64, 64]
  LQ_stage: true
network_d: {{type: UNetDiscriminatorSN, num_in_ch: 3}}
path:
  strict_load: false
  visualization: {tmp_path}/vis
val:
  save_img: false
  key_metric: psnr
  metrics:
    psnr: {{type: psnr, crop_border: 4, test_y_channel: true}}
logger: {{use_tb_logger: false}}
""")
    model = build_model(opt)
    ds_opt = opt['datasets']['test_1']
    dataset = build_dataset(ds_opt)
    loader = build_dataloader(dataset, ds_opt, num_gpu=1, dist=False)

    model.dist_validation(loader, 1, None, save_img=False)
    sharded = dict(model.metric_results)
    model.nondist_validation(loader, 1, None, save_img=False)
    single = dict(model.metric_results)

    assert sharded.keys() == single.keys()
    for k in single:
        np.testing.assert_allclose(sharded[k], single[k], rtol=1e-4,
                                   err_msg=k)


def test_parity_suite_dryrun(tmp_path):
    """PARITY.md's one-command runbook must run end-to-end offline.

    Exercises config 1 (x4 inference CLI + PSNR/SSIM metric CLI) with
    shim-generated stand-in weights in the exact release .pth layout;
    configs 2-5 share the same plumbing and are dry-run manually
    (NOTES_ROUND3.md). Config 4 (no weights needed) runs the quantizer
    parity pytest through the suite's env hook.
    """
    env = dict(os.environ, JAX_PLATFORMS='cpu')
    proc = subprocess.run(
        [sys.executable, osp.join(REPO, 'scripts/run_parity_suite.py'),
         '--dryrun', '--out', str(tmp_path), '--skip', '2,3,4,5'],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1200)
    assert proc.returncode == 0, (
        f'stdout:\n{proc.stdout[-3000:]}\nstderr:\n{proc.stderr[-3000:]}')
    assert 'parity suite complete' in proc.stdout
    assert (tmp_path / 'ours_x4').is_dir()
    assert len(list((tmp_path / 'ours_x4').glob('*.png'))) == 2


def test_train_pipeline_e2e_with_chain_steps(eval_data, tmp_path):
    """Full train_pipeline run (the train.py surface) with chain_steps=2:
    4 iters as 2 scan-chained dispatches, prefetcher wiring, crossed()-based
    print/save cadence, checkpoint written at the end."""
    opt_path = tmp_path / 'opt.yml'
    opt_path.write_text(f"""
name: chain_smoke
model_type: FeMaSRModel
scale: 4
num_gpu: 1
manual_seed: 0
datasets:
  train:
    name: t
    type: PairedImageDataset
    dataroot_gt: {eval_data}/gt
    dataroot_lq: {eval_data}/lq
    io_backend: {{type: disk}}
    gt_size: 64
    use_resize_crop: false
    use_flip: false
    use_rot: false
    batch_size_per_gpu: 1
    num_worker_per_gpu: 0
network_g:
  type: FeMaSRNet
  gt_resolution: 256
  norm_type: 'gn'
  act_type: 'silu'
  codebook_params: [[32, 64, 64]]
  LQ_stage: false
network_d: {{type: UNetDiscriminatorSN, num_in_ch: 3}}
path: {{strict_load: false}}
train:
  chain_steps: 2
  optim_g: {{type: Adam, lr: !!float 1e-4, weight_decay: 0, betas: [0.9, 0.99]}}
  optim_d: {{type: Adam, lr: !!float 4e-4, weight_decay: 0, betas: [0.9, 0.99]}}
  scheduler: {{type: MultiStepLR, milestones: [50000], gamma: 1}}
  total_iter: 4
  warmup_iter: -1
  pixel_opt: {{type: L1Loss, loss_weight: 1.0, reduction: mean}}
  gan_opt: {{type: GANLoss, gan_type: hinge, real_label_val: 1.0,
            fake_label_val: 0.0, loss_weight: 0.1}}
  codebook_opt: {{loss_weight: 1.0}}
  net_d_iters: 1
  net_d_init_iters: !!float 0
val: ~
logger:
  print_freq: 2
  save_checkpoint_freq: 4
  use_tb_logger: false
""")
    env = dict(os.environ, JAX_PLATFORMS='cpu')
    proc = subprocess.run(
        [sys.executable, '-c',
         'import sys; sys.argv = ["train.py", "-opt", sys.argv[1]]; '
         'from femasr_tpu.train.pipeline import train_pipeline; '
         f'train_pipeline({str(str(tmp_path))!r})',
         str(opt_path)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, (
        f'stdout:\n{proc.stdout[-2000:]}\nstderr:\n{proc.stderr[-3000:]}')
    exp = tmp_path / 'experiments' / 'chain_smoke'
    models_dir = exp / 'models'
    assert models_dir.is_dir()
    names = os.listdir(models_dir)
    assert any('net_g' in n for n in names), names
    log_text = proc.stderr + proc.stdout
    for f in exp.glob('*.log'):
        log_text += f.read_text()
    assert 'iter:' in log_text  # print_freq crossing fired
