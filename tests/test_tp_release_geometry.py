"""Release-geometry tensor-parallel training step — VERDICT r4 #7.

The multichip dryrun runs tiny geometry (codebook [32,64,64]) for CPU
budget; this test runs ONE full G+D step at the RELEASE codebook
geometry (n_e=1024, e_dim=512 — /root/reference/options/train_FeMaSR_
LQ_stage.yml:45-47) on the 8-device CPU mesh with model_parallel=2, and
asserts the TP sharding specs are actually applied to the 512-dim
codebook / qkv / mlp params (parallel/mesh.py TP_RULES), not silently
skipped by the divisibility guard.

Marked `heavy` (one release-size compile on the 1-core container).
"""
import os
import re

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))

RELEASE_CODEBOOK = [[32, 1024, 512]]


@pytest.mark.heavy
def test_release_geometry_tp_train_step(tmp_path):
    import jax
    import jax.numpy as jnp
    from flax.traverse_util import flatten_dict

    from femasr_tpu.models import FeMaSRNet
    from femasr_tpu.parallel.mesh import TP_RULES
    from femasr_tpu.train import build_model
    from femasr_tpu.utils.checkpoint import save_pytree, to_host
    from femasr_tpu.utils.options import yaml_load

    # frozen HQ prior at release geometry: init-only (no stage-1 trainer —
    # the LQ step only needs its params for gt_indices supervision)
    hq = FeMaSRNet(codebook_params=RELEASE_CODEBOOK, LQ_stage=False,
                   scale_factor=4, norm_type='gn', act_type='silu')
    hq_params = hq.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 64, 3), jnp.float32))['params']
    save_pytree({'params': to_host(hq_params)}, f'{tmp_path}/hq.ckpt')
    del hq_params

    opt = yaml_load(f"""
name: tp_release_geom
model_type: FeMaSRModel
scale: 4
num_gpu: 8
model_parallel: 2
manual_seed: 0
is_train: true
dist: false
rank: 0
world_size: 1
datasets:
  train: {{phase: train, scale: 4, gt_size: 64}}
network_g:
  type: FeMaSRNet
  gt_resolution: 256
  norm_type: 'gn'
  act_type: 'silu'
  codebook_params:
    - [32, 1024, 512]
  LQ_stage: true
  frozen_module_keywords: ['quantize', 'decoder', 'after_quant_group',
                           'out_conv']
  scale_factor: 4
network_d: {{type: UNetDiscriminatorSN, num_in_ch: 3}}
path:
  strict_load: false
  pretrain_network_hq: {tmp_path}/hq.ckpt
  models: {tmp_path}/models
  training_states: {tmp_path}/states
  visualization: {tmp_path}/vis
train:
  optim_g: {{type: Adam, lr: !!float 1e-4, weight_decay: 0, betas: [0.9, 0.99]}}
  optim_d: {{type: Adam, lr: !!float 4e-4, weight_decay: 0, betas: [0.9, 0.99]}}
  scheduler: {{type: MultiStepLR, milestones: [50000], gamma: 1}}
  total_iter: 10
  warmup_iter: -1
  pixel_opt: {{type: L1Loss, loss_weight: 1.0, reduction: mean}}
  gan_opt: {{type: GANLoss, gan_type: hinge, real_label_val: 1.0,
            fake_label_val: 0.0, loss_weight: 0.1}}
  codebook_opt: {{loss_weight: 1.0}}
  net_d_iters: 1
  net_d_init_iters: !!float 0
val: {{val_freq: 1e9, metrics: {{psnr: {{type: psnr}}}}}}
logger: {{print_freq: 1, use_tb_logger: false}}
""")
    model = build_model(opt)

    # the TP rules must have matched REAL params at release geometry —
    # codebook embedding (1024, 512) over 'model', plus qkv/fc1/fc2 —
    # and been applied, not skipped by the divisibility guard.
    flat = flatten_dict(model.state.params_g, sep='/')
    matched = {pat: [] for pat, _ in TP_RULES}
    for path, leaf in flat.items():
        for pat, spec in TP_RULES:
            if re.match(pat, path):
                matched[pat].append((path, leaf))
                break
    emb_pat = next(p for p in matched if 'embedding' in p)
    assert matched[emb_pat], 'codebook embedding not found in params'
    for pat, hits in matched.items():
        assert hits, f'TP rule matched nothing: {pat}'
        for path, leaf in hits:
            assert 'model' in (leaf.sharding.spec or ()), (
                f'{path}: TP spec not applied (sharding={leaf.sharding})')
    emb_path, emb = matched[emb_pat][0]
    assert emb.shape == (1024, 512), emb.shape
    # the 512-dim codebook really is split: each shard holds 512 codes
    db = emb.addressable_shards[0].data.shape
    assert db[0] == 512, f'codebook not split over model axis: {db}'

    # one full G+D step: dp=4 x tp=2, batch 4, tiny spatial dims
    rng = np.random.default_rng(0)
    batch = {'lq': rng.random((4, 16, 16, 3), dtype=np.float32),
             'gt': rng.random((4, 64, 64, 3), dtype=np.float32)}
    model.feed_data(batch)
    model.optimize_parameters(1)
    log = model.get_current_log()
    assert log, 'no losses logged'
    assert all(np.isfinite(v) for v in log.values()), f'non-finite: {log}'
