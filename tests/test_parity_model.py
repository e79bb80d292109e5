"""Whole-network golden parity: FeMaSRNet (HQ & LQ) and UNetDiscriminatorSN
vs the reference torch implementation with converted random weights."""

import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from femasr_tpu.models import FeMaSRNet, UNetDiscriminatorSN
from femasr_tpu.models.convert import (convert_discriminator_checkpoint,
                                       convert_femasr_checkpoint,
                                       merge_params, state_dict_to_numpy)
from reference_shim import load_reference_module

torch.manual_seed(0)

CODEBOOK = [[32, 1024, 512]]


def to_nhwc(t):
    return np.ascontiguousarray(t.detach().numpy().transpose(0, 2, 3, 1))


def _build_pair(lq_stage, scale_factor=4):
    femasr_arch = load_reference_module('basicsr.archs.femasr_arch')
    tnet = femasr_arch.FeMaSRNet(
        codebook_params=CODEBOOK, LQ_stage=lq_stage, scale_factor=scale_factor,
        norm_type='gn', act_type='silu', use_semantic_loss=False).eval()
    sd = state_dict_to_numpy(tnet.state_dict())
    loaded = convert_femasr_checkpoint(
        sd, codebook_params=CODEBOOK, LQ_stage=lq_stage,
        scale_factor=scale_factor, act_type='silu')

    jnet = FeMaSRNet(codebook_params=CODEBOOK, LQ_stage=lq_stage,
                     scale_factor=scale_factor, norm_type='gn',
                     act_type='silu')
    return tnet, jnet, loaded


@pytest.mark.parametrize('lq_stage,in_hw', [(False, 64), (True, 32)])
def test_femasr_forward_parity(lq_stage, in_hw):
    tnet, jnet, loaded = _build_pair(lq_stage)
    x = torch.rand(1, 3, in_hw, in_hw)

    with torch.no_grad():
        out_ref, cb_ref, _, idx_ref = tnet(x)

    xj = jnp.asarray(to_nhwc(x))
    init = jnet.init(jax.random.PRNGKey(0), xj)
    params = merge_params(init['params'], loaded)
    out, cb_loss, _, idx = jnet.apply({'params': params}, xj)

    # identical code selection
    np.testing.assert_array_equal(
        np.asarray(idx[0]).reshape(-1), idx_ref[0].numpy().reshape(-1))
    np.testing.assert_allclose(float(cb_loss), float(cb_ref), rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out), to_nhwc(out_ref),
                               atol=2e-4, rtol=1e-4)


def test_femasr_lq_gt_indices_parity():
    """LQ-stage training path: GT-index supervision & gram/texture loss."""
    tnet, jnet, loaded = _build_pair(True)
    x = torch.rand(1, 3, 32, 32)
    gt_idx_t = torch.randint(0, 1024, (1, 1, 16, 16))

    with torch.no_grad():
        out_ref, cb_ref, _, _ = tnet(x, gt_indices=[gt_idx_t])

    xj = jnp.asarray(to_nhwc(x))
    init = jnet.init(jax.random.PRNGKey(0), xj)
    params = merge_params(init['params'], loaded)
    out, cb_loss, _, _ = jnet.apply(
        {'params': params}, xj,
        gt_indices=[jnp.asarray(gt_idx_t.numpy().reshape(1, 16, 16))])

    np.testing.assert_allclose(float(cb_loss), float(cb_ref), rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out), to_nhwc(out_ref),
                               atol=2e-4, rtol=1e-4)


def test_decode_indices_parity():
    tnet, jnet, loaded = _build_pair(False)
    idx_t = torch.arange(16).reshape(16, 1, 1, 1).repeat(1, 1, 2, 2)

    with torch.no_grad():
        out_ref = tnet.decode_indices(idx_t)

    init = jnet.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    params = merge_params(init['params'], loaded)
    out = jnet.apply({'params': params},
                     jnp.asarray(idx_t.numpy()), method='decode_indices')
    np.testing.assert_allclose(np.asarray(out), to_nhwc(out_ref),
                               atol=2e-4, rtol=1e-4)


def test_discriminator_parity():
    disc_arch = load_reference_module('basicsr.archs.discriminator_arch')
    tdisc = disc_arch.UNetDiscriminatorSN(num_in_ch=3).eval()
    sd = state_dict_to_numpy(tdisc.state_dict())
    params, spectral = convert_discriminator_checkpoint(sd)

    x = torch.rand(2, 3, 32, 32)
    with torch.no_grad():
        ref = to_nhwc(tdisc(x))

    jdisc = UNetDiscriminatorSN(num_in_ch=3)
    init = jdisc.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    params = merge_params(init['params'], params)
    spectral = merge_params(init['spectral'], spectral)
    out = jdisc.apply({'params': params, 'spectral': spectral},
                      jnp.asarray(to_nhwc(x)))
    # A fresh (unconverged) spectral norm barely normalizes, so activations
    # blow up through 9 layers and amplify f32 noise — compare relatively.
    scale = np.abs(ref).max()
    np.testing.assert_allclose(np.asarray(out) / scale, ref / scale, atol=2e-3)


def test_discriminator_power_iteration_matches_torch_train_step():
    """One training forward must update u/v exactly like torch."""
    disc_arch = load_reference_module('basicsr.archs.discriminator_arch')
    tdisc = disc_arch.UNetDiscriminatorSN(num_in_ch=3).train()
    sd0 = state_dict_to_numpy(tdisc.state_dict())
    params, spectral = convert_discriminator_checkpoint(sd0)

    x = torch.rand(1, 3, 16, 16)
    with torch.no_grad():
        ref = to_nhwc(tdisc(x))  # train mode: runs power iteration
    sd1 = state_dict_to_numpy(tdisc.state_dict())

    jdisc = UNetDiscriminatorSN(num_in_ch=3)
    init = jdisc.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    params = merge_params(init['params'], params)
    spectral = merge_params(init['spectral'], spectral)
    out, mutated = jdisc.apply({'params': params, 'spectral': spectral},
                               jnp.asarray(to_nhwc(x)), update_stats=True,
                               mutable=['spectral'])
    scale = np.abs(ref).max()
    np.testing.assert_allclose(np.asarray(out) / scale, ref / scale, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(mutated['spectral']['conv1']['u']),
        sd1['conv1.weight_u'], atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(mutated['spectral']['conv3']['v']),
        sd1['conv3.weight_v'], atol=1e-5)


def test_fused_upsample_model_equivalence():
    """FeMaSRNet(fused upsample blocks) == default path on the same params."""
    from femasr_tpu.models.femasr_arch import DecoderBlock
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 64)).astype(np.float32))
    blk = DecoderBlock(out_ch=64, fused_upsample=False)
    params = blk.init(jax.random.PRNGKey(0), x)['params']
    blk_fused = DecoderBlock(out_ch=64, fused_upsample=True)
    out_plain = blk.apply({'params': params}, x)
    out_fused = blk_fused.apply({'params': params}, x)
    assert out_plain.shape == out_fused.shape == (1, 16, 16, 64)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_plain),
                               atol=5e-5)


def test_s2d_tail_model_equivalence():
    """FeMaSRNet(s2d_tail=True) == default path on the same params.

    The space-to-depth tail re-associates the last decoder level's convs
    onto a (H, W, 4C) packing (ops/layers.py conv3_s2d) — exact math up to
    float reduction order.
    """
    from femasr_tpu.models.femasr_arch import (DecoderBlock, DecoderBlockS2D,
                                               pixel_shuffle_phase_major)
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 8, 8, 128))
    blk = DecoderBlock(out_ch=64)
    params = blk.init(jax.random.PRNGKey(1), x)['params']
    out_plain = blk.apply({'params': params}, x)
    blk_s2d = DecoderBlockS2D(out_ch=64)
    out_s2d = pixel_shuffle_phase_major(blk_s2d.apply({'params': params}, x))
    assert out_plain.shape == out_s2d.shape == (1, 16, 16, 64)
    np.testing.assert_allclose(np.asarray(out_s2d), np.asarray(out_plain),
                               atol=2e-5, rtol=2e-5)

    net = FeMaSRNet(codebook_params=[[32, 64, 64]], LQ_stage=True,
                    scale_factor=4, norm_type='gn', act_type='silu')
    xi = jax.random.uniform(jax.random.PRNGKey(2), (1, 16, 16, 3))
    variables = net.init(jax.random.PRNGKey(3), xi)
    ref, _, _, idx_ref = net.apply(variables, xi)
    net_s2d = FeMaSRNet(codebook_params=[[32, 64, 64]], LQ_stage=True,
                        scale_factor=4, norm_type='gn', act_type='silu',
                        s2d_tail=True)
    out, _, _, idx = net_s2d.apply(variables, xi)
    assert out.shape == ref.shape
    np.testing.assert_array_equal(np.asarray(idx[0]), np.asarray(idx_ref[0]))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_int8_tail_model_quality():
    """FeMaSRNet(int8_tail=True) runs the SAME params through w8a8 convs
    (checkpoint-free quantization) and must stay close to the float path:
    codebook indices identical (the tail is after the VQ), output within
    int8 quantization noise."""
    net = FeMaSRNet(codebook_params=[[32, 64, 64]], LQ_stage=True,
                    scale_factor=4, norm_type='gn', act_type='silu')
    xi = jax.random.uniform(jax.random.PRNGKey(2), (1, 16, 16, 3))
    variables = net.init(jax.random.PRNGKey(3), xi)
    ref, _, _, idx_ref = net.apply(variables, xi)
    for kw in (dict(int8_tail=True),
               dict(int8_tail=True, int8_levels=3, int8_enc_up=True)):
        net_i8 = FeMaSRNet(codebook_params=[[32, 64, 64]], LQ_stage=True,
                           scale_factor=4, norm_type='gn', act_type='silu',
                           **kw)
        out, _, _, idx = net_i8.apply(variables, xi)
        assert out.shape == ref.shape
        # indices must be IDENTICAL: the tail is post-VQ and the int8
        # encoder up blocks feed only post-quantizer skips
        np.testing.assert_array_equal(np.asarray(idx[0]),
                                      np.asarray(idx_ref[0]))
        err = np.asarray(out) - np.asarray(ref)
        span = float(np.asarray(ref).max() - np.asarray(ref).min()) or 1.0
        psnr = 10 * np.log10(span ** 2 / max(float(np.mean(err ** 2)),
                                             1e-12))
        assert psnr > 30.0, f'int8 {kw} too lossy: {psnr:.1f} dB'


def test_int8_swin_model_quality():
    """FeMaSRNet(int8_swin=True) runs the SAME params through w8a8 swin
    linears. Swin is PRE-quantizer, so indices may flip on near-ties
    (bounded), and the output must stay within int8 noise of float."""
    from femasr_tpu.ops.layers import DenseInt8
    import flax.linen as fnn

    # unit: DenseInt8 param tree == nn.Dense and output within w8a8 noise
    xd = jax.random.normal(jax.random.PRNGKey(0), (32, 48))
    dense_f = fnn.Dense(24, param_dtype=jnp.float32)
    vf = dense_f.init(jax.random.PRNGKey(1), xd)
    dense_q = DenseInt8(24)
    assert (jax.tree_util.tree_structure(vf)
            == jax.tree_util.tree_structure(dense_q.init(
                jax.random.PRNGKey(1), xd)))
    yf = np.asarray(dense_f.apply(vf, xd))
    yq = np.asarray(dense_q.apply(vf, xd))
    rel = np.abs(yq - yf).mean() / (np.abs(yf).mean() or 1.0)
    assert rel < 0.02, f'dense_w8a8 error too large: {rel:.4f}'

    net = FeMaSRNet(codebook_params=[[32, 64, 64]], LQ_stage=True,
                    scale_factor=4, norm_type='gn', act_type='silu')
    xi = jax.random.uniform(jax.random.PRNGKey(2), (1, 16, 16, 3))
    variables = net.init(jax.random.PRNGKey(3), xi)
    ref, _, _, idx_ref = net.apply(variables, xi)
    net_i8 = FeMaSRNet(codebook_params=[[32, 64, 64]], LQ_stage=True,
                       scale_factor=4, norm_type='gn', act_type='silu',
                       int8_swin=True)
    out, _, _, idx = net_i8.apply(variables, xi)
    assert out.shape == ref.shape
    flips = float((np.asarray(idx[0]) != np.asarray(idx_ref[0])).mean())
    assert flips < 0.10, f'int8_swin flips too many indices: {flips:.1%}'
    err = np.asarray(out) - np.asarray(ref)
    span = float(np.asarray(ref).max() - np.asarray(ref).min()) or 1.0
    psnr = 10 * np.log10(span ** 2 / max(float(np.mean(err ** 2)), 1e-12))
    assert psnr > 28.0, f'int8_swin too lossy: {psnr:.1f} dB'


def test_discriminator_init_magnitude_sane():
    """Spectral norm must actually constrain the fresh discriminator.

    With a cold power iteration (random u, one step) the sigma of each of
    the 9 SN convs is underestimated and the composed amplification reaches
    ~1e13 at init (round-1 dryrun); the warm-started iteration keeps D
    outputs O(1), so hinge-GAN losses start at sane magnitudes.
    """
    disc = UNetDiscriminatorSN(num_in_ch=3)
    x = jax.random.uniform(jax.random.PRNGKey(5), (2, 64, 64, 3))
    variables = disc.init(jax.random.PRNGKey(0), x)
    out = np.asarray(disc.apply(variables, x))
    assert np.isfinite(out).all()
    assert np.abs(out).max() < 50.0, f'|D(x)| at init: {np.abs(out).max()}'


@pytest.mark.parametrize('lq_stage', [False, True])
def test_femasr_multiscale_codebook_parity(lq_stage):
    """Two codebook scales ([[32,..],[64,..]]): exercises the multi-codebook
    wiring — prev_dec_feat concat into before_quant, CombineQuantBlock's
    second input, per-scale indices (reference femasr_arch.py:276-299,
    330-369)."""
    codebook = [[32, 16, 32], [64, 16, 16]]
    femasr_arch = load_reference_module('basicsr.archs.femasr_arch')
    tnet = femasr_arch.FeMaSRNet(
        codebook_params=codebook, LQ_stage=lq_stage, scale_factor=4,
        norm_type='gn', act_type='silu', use_semantic_loss=False).eval()
    sd = state_dict_to_numpy(tnet.state_dict())
    loaded = convert_femasr_checkpoint(
        sd, codebook_params=codebook, LQ_stage=lq_stage, scale_factor=4,
        act_type='silu')

    jnet = FeMaSRNet(codebook_params=codebook, LQ_stage=lq_stage,
                     scale_factor=4, norm_type='gn', act_type='silu')
    in_hw = 32 if lq_stage else 64
    x = torch.rand(1, 3, in_hw, in_hw)
    with torch.no_grad():
        ref_out, _, _, ref_idx = tnet(x)

    init = jnet.init(jax.random.PRNGKey(0), jnp.zeros((1, in_hw, in_hw, 3)))
    params = merge_params(init['params'], loaded)
    out, _, _, idx = jnet.apply({'params': params}, jnp.asarray(to_nhwc(x)))
    assert len(idx) == 2 and len(ref_idx) == 2
    for ours, theirs in zip(idx, ref_idx):
        np.testing.assert_array_equal(
            np.asarray(ours).reshape(-1),
            theirs.detach().numpy().reshape(-1))
    np.testing.assert_allclose(np.asarray(out), to_nhwc(ref_out),
                               atol=2e-4, rtol=2e-3)
