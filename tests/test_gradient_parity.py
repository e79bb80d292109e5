"""Full-generator gradient parity vs reference torch autograd.

SURVEY.md §7 hard part #1: the straight-through / stop-gradient placement in
the quantizer bottleneck is easy to get silently wrong — outputs can match
while gradients diverge. This compares d(loss)/d(params) for the complete
LQ-stage generator (pixel + codebook loss) computed by jax.grad vs torch
autograd on identical converted weights.
"""

import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from flax.traverse_util import flatten_dict  # noqa: E402

from femasr_tpu.models import FeMaSRNet  # noqa: E402
from femasr_tpu.models.convert import (convert_femasr_checkpoint,  # noqa: E402
                                       femasr_param_mapping, merge_params,
                                       state_dict_to_numpy)
from reference_shim import load_reference_module  # noqa: E402

CODEBOOK = [[32, 64, 64]]


def test_generator_gradient_parity_lq_stage():
    femasr_arch = load_reference_module('basicsr.archs.femasr_arch')
    torch.manual_seed(0)
    tnet = femasr_arch.FeMaSRNet(codebook_params=CODEBOOK, LQ_stage=True,
                                 scale_factor=4, norm_type='gn',
                                 act_type='silu').train()
    sd = state_dict_to_numpy(tnet.state_dict())
    loaded = convert_femasr_checkpoint(sd, codebook_params=CODEBOOK,
                                       LQ_stage=True, scale_factor=4)

    rng = np.random.default_rng(0)
    lq = rng.random((1, 3, 32, 32)).astype(np.float32)
    gt = rng.random((1, 3, 128, 128)).astype(np.float32)
    gt_idx = rng.integers(0, 64, (1, 1, 16, 16))

    # --- torch backward (codebook loss + L1 pixel loss) ---
    lq_t = torch.from_numpy(lq)
    out_t, l_codebook_t, _, _ = tnet(lq_t, gt_indices=[torch.from_numpy(gt_idx)])
    loss_t = l_codebook_t + torch.nn.functional.l1_loss(
        out_t, torch.from_numpy(gt))
    loss_t.backward()
    tgrads = {k: (p.grad.numpy().copy() if p.grad is not None else None)
              for k, p in tnet.named_parameters()}

    # --- jax grad on identical weights ---
    jnet = FeMaSRNet(codebook_params=CODEBOOK, LQ_stage=True, scale_factor=4,
                     norm_type='gn', act_type='silu')
    lq_j = jnp.asarray(lq.transpose(0, 2, 3, 1))
    gt_j = jnp.asarray(gt.transpose(0, 2, 3, 1))
    init = jnet.init(jax.random.PRNGKey(0), lq_j)
    params = merge_params(init['params'], loaded)

    def loss_fn(p):
        out, l_codebook, _, _ = jnet.apply(
            {'params': p}, lq_j,
            gt_indices=[jnp.asarray(gt_idx.reshape(1, 16, 16))], train=True)
        return l_codebook + jnp.mean(jnp.abs(out.astype(jnp.float32) - gt_j))

    loss_j, grads_j = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(float(loss_j), float(loss_t.detach()),
                               rtol=1e-4)

    # compare gradients through the conversion mapping
    mapping = femasr_param_mapping(codebook_params=CODEBOOK, LQ_stage=True,
                                   scale_factor=4)
    flat_j = flatten_dict(grads_j)
    checked = 0
    worst = 0.0
    for flax_path, (torch_key, transform) in mapping.items():
        tg = tgrads.get(torch_key)
        if tg is None or flax_path not in flat_j:
            continue
        jg = np.asarray(flat_j[flax_path])
        if transform.__name__ == '_conv_w':
            tg = tg.transpose(2, 3, 1, 0)
        elif transform.__name__ == '_lin_w':
            tg = tg.T
        scale = max(np.abs(tg).max(), 1e-8)
        err = np.abs(jg - tg).max() / scale
        worst = max(worst, err)
        assert err < 5e-3, f'gradient mismatch at {flax_path}: rel {err:.2e}'
        checked += 1
    assert checked > 300, f'only {checked} gradient tensors compared'
    print(f'compared {checked} gradient tensors, worst rel err {worst:.2e}')
