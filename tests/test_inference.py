"""Inference-path tests: padded whole-image parity vs reference `test()`, and
batched-tile self-consistency."""

import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from femasr_tpu.models.convert import (convert_femasr_checkpoint,
                                       state_dict_to_numpy)
from femasr_tpu.models.inference import SRInferencer, flip_pad
from reference_shim import load_reference_module

CODEBOOK = [[32, 1024, 512]]


def _make_pair(scale=4):
    torch.manual_seed(0)
    femasr_arch = load_reference_module('basicsr.archs.femasr_arch')
    tnet = femasr_arch.FeMaSRNet(codebook_params=CODEBOOK, LQ_stage=True,
                                 scale_factor=scale, norm_type='gn',
                                 act_type='silu').eval()
    sd = state_dict_to_numpy(tnet.state_dict())
    params = convert_femasr_checkpoint(sd, codebook_params=CODEBOOK,
                                       LQ_stage=True, scale_factor=scale)
    sr = SRInferencer(params, scale_factor=scale, dtype=jnp.float32)
    return tnet, sr


def test_flip_pad_matches_reference_padding():
    x = jnp.arange(2 * 5 * 7 * 3, dtype=jnp.float32).reshape(2, 5, 7, 3)
    t = torch.from_numpy(np.asarray(x).transpose(0, 3, 1, 2))
    h_pad, w_pad = 3, 2
    t2 = torch.cat([t, torch.flip(t, [2])], 2)[:, :, :5 + h_pad, :]
    t2 = torch.cat([t2, torch.flip(t2, [3])], 3)[:, :, :, :7 + w_pad]
    out = flip_pad(x, h_pad, w_pad)
    np.testing.assert_array_equal(
        np.asarray(out), t2.numpy().transpose(0, 2, 3, 1))


def test_whole_image_parity_with_reference_test():
    tnet, sr = _make_pair()
    rng = np.random.default_rng(0)
    img = rng.random((1, 30, 31, 3), dtype=np.float32)

    with torch.no_grad():
        ref = tnet.test(torch.from_numpy(img.transpose(0, 3, 1, 2)))
    ref = ref.numpy().transpose(0, 2, 3, 1)

    out = np.asarray(sr.run_padded(jnp.asarray(img)))
    assert out.shape == ref.shape == (1, 120, 124, 3)
    np.testing.assert_allclose(out, np.clip(ref, 0, 1), atol=5e-4)


def test_tiled_matches_whole_in_interior():
    _, sr = _make_pair()
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.random((1, 48, 40, 3), dtype=np.float32))

    whole = np.asarray(sr.run_padded(img))
    tiled = np.asarray(sr.run_tiled(img, tile_size=16, tile_pad=8))
    assert tiled.shape == whole.shape == (1, 192, 160, 3)
    # interior far from tile seams and image borders should agree closely
    diff = np.abs(tiled - whole)[:, 32:-32, 32:-32]
    assert np.median(diff) < 2e-2

    # fused-chunk path (whole grid in ONE lax.map dispatch) must equal
    # the python-loop chunk path exactly (same forwards, same stitch);
    # max_tile_batch 4 with 6 tiles also exercises the ragged-chunk pad
    sr.max_tile_batch = 4
    loop = np.asarray(sr.run_tiled(img, tile_size=16, tile_pad=8))
    fused = np.asarray(sr.run_tiled(img, tile_size=16, tile_pad=8,
                                    fuse_chunks=True))
    np.testing.assert_allclose(fused, loop, atol=1e-6)


def test_dispatcher_selects_paths():
    _, sr = _make_pair()
    rng = np.random.default_rng(2)
    img = rng.random((20, 24, 3), dtype=np.float32)
    out = sr(img, max_size=600)  # whole path
    assert out.shape == (80, 96, 3)
    out2 = sr(img, max_size=16, tile_size=16, tile_pad=8)  # forced tiled path
    assert out2.shape == (80, 96, 3)


def test_bucketed_folder_inference():
    _, sr = _make_pair()
    rng = np.random.default_rng(3)
    imgs = [rng.random((20, 24, 3), dtype=np.float32),
            rng.random((22, 20, 3), dtype=np.float32),  # same bucket
            rng.random((40, 40, 3), dtype=np.float32)]  # different bucket
    outs = sr.run_bucketed(imgs, bucket=32, max_batch=2)
    assert [o.shape for o in outs] == [(80, 96, 3), (88, 80, 3),
                                       (160, 160, 3)]
    # bucketed result must match the per-image padded path
    solo = np.asarray(sr.run_padded(jnp.asarray(imgs[0])[None])[0])
    # same network, different padding context -> allow small border effects
    h, w = 20 * 4, 24 * 4
    diff = np.abs(outs[0][:h - 16, :w - 16] - solo[:h - 16, :w - 16])
    assert np.median(diff) < 2e-2


def test_load_inferencer_hq_pth(tmp_path):
    """load_inferencer(lq_stage=False) converts an HQ .pth with the HQ
    encoder layout (regression: LQ_stage was hardcoded True, silently
    leaving the HQ down-blocks at random init)."""
    femasr_arch = load_reference_module('basicsr.archs.femasr_arch')
    torch.manual_seed(1)
    tnet = femasr_arch.FeMaSRNet(codebook_params=CODEBOOK, LQ_stage=False,
                                 norm_type='gn', act_type='silu').eval()
    pth = tmp_path / 'hq.pth'
    torch.save({'params': tnet.state_dict()}, str(pth))

    from femasr_tpu.models.inference import load_inferencer
    sr = load_inferencer(str(pth), scale_factor=4, dtype=jnp.float32,
                         lq_stage=False)
    rng = np.random.default_rng(0)
    img = rng.random((1, 32, 32, 3), dtype=np.float32)
    with torch.no_grad():
        ref = tnet.test(torch.from_numpy(img.transpose(0, 3, 1, 2)))
    out = np.asarray(sr.run_padded(jnp.asarray(img)))
    assert out.shape == tuple(np.moveaxis(ref.numpy(), 1, -1).shape)
    np.testing.assert_allclose(
        out, np.clip(np.moveaxis(ref.numpy(), 1, -1), 0, 1), atol=5e-4)


def test_mesh_sharded_inference_matches_single_device():
    """DP-sharded serving over the 8-device CPU mesh == unsharded output
    (the reference's inference is strictly single-GPU; here batches shard
    over the mesh 'data' axis, incl. batch sizes not divisible by dp)."""
    from femasr_tpu.parallel.mesh import create_mesh
    tnet, sr = _make_pair()
    del tnet
    mesh = create_mesh(data=4, model=2)
    sr_mesh = SRInferencer(sr.params, scale_factor=4, dtype=jnp.float32,
                           mesh=mesh, tensor_parallel=True)

    rng = np.random.default_rng(7)
    imgs = [rng.random((20, 24, 3), dtype=np.float32) for _ in range(3)]
    ref = sr.run_bucketed(imgs, bucket=32, max_batch=3)
    out = sr_mesh.run_bucketed(imgs, bucket=32, max_batch=3)  # b=3, dp=4
    for r, o in zip(ref, out):
        np.testing.assert_allclose(o, r, atol=2e-5)

    # whole-image path (batch 1 -> padded to the data axis internally)
    solo_ref = np.asarray(sr.run_padded(jnp.asarray(imgs[0])[None]))
    solo = np.asarray(sr_mesh.run_padded(jnp.asarray(imgs[0])[None]))
    np.testing.assert_allclose(solo, solo_ref, atol=2e-5)


def test_x2_whole_image_parity():
    """x2 model family (BASELINE config 2): wsz=32 padding + parity."""
    tnet, sr = _make_pair(scale=2)
    rng = np.random.default_rng(4)
    img = rng.random((1, 40, 44, 3), dtype=np.float32)
    with torch.no_grad():
        ref = tnet.test(torch.from_numpy(img.transpose(0, 3, 1, 2)))
    ref = ref.numpy().transpose(0, 2, 3, 1)
    out = np.asarray(sr.run_padded(jnp.asarray(img)))
    assert out.shape == ref.shape == (1, 80, 88, 3)
    np.testing.assert_allclose(out, np.clip(ref, 0, 1), atol=5e-4)


def test_bf16_close_to_f32():
    """Mixed-precision sanity: bf16 inference within ~1% of f32."""
    torch.manual_seed(0)
    femasr_arch = load_reference_module('basicsr.archs.femasr_arch')
    tnet = femasr_arch.FeMaSRNet(codebook_params=CODEBOOK, LQ_stage=True,
                                 scale_factor=4, norm_type='gn',
                                 act_type='silu').eval()
    from femasr_tpu.models.convert import convert_femasr_checkpoint
    sd = state_dict_to_numpy(tnet.state_dict())
    params = convert_femasr_checkpoint(sd, codebook_params=CODEBOOK,
                                       LQ_stage=True, scale_factor=4)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((1, 32, 32, 3), dtype=np.float32))
    sr32 = SRInferencer(params, scale_factor=4, dtype=jnp.float32)
    sr16 = SRInferencer(params, scale_factor=4, dtype=jnp.bfloat16)
    out32 = np.asarray(sr32.run_padded(img))
    out16 = np.asarray(sr16.run_padded(img))
    err = np.abs(out32 - out16).mean()
    assert err < 0.02, f'bf16 deviates too much: mean abs {err}'


def test_int8_serving_quality_full_arch():
    """int8 serving modes on the RELEASE architecture with converted
    reference weights: output must stay within int8 quantization noise of
    the f32 engine (PSNR gate), end-to-end through SRInferencer."""
    tnet, sr = _make_pair()
    del tnet
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.random((1, 32, 32, 3), dtype=np.float32))
    ref = np.asarray(sr.run_padded(img))

    sr_i8 = SRInferencer(sr.params, scale_factor=4, dtype=jnp.float32,
                         int8_tail=True, int8_levels=3, int8_enc_up=True,
                         init_merge=False)
    out = np.asarray(sr_i8.run_padded(img))
    assert out.shape == ref.shape
    err = out - ref
    psnr = 10 * np.log10(1.0 / max(float(np.mean(err ** 2)), 1e-12))
    assert psnr > 30.0, f'int8 serving too lossy on release arch: {psnr:.1f} dB'


def test_int8_swin_quality_full_arch():
    """int8_swin (w8a8 qkv/proj/mlp) on the RELEASE architecture: swin is
    pre-quantizer, so gate BOTH the codebook index flip rate (near-ties
    only — calibrated 2.7% on this arch/seed) and output PSNR (40.0 dB
    measured; also gates the everything-int8 combination, 32.5 dB)."""
    from femasr_tpu.models import FeMaSRNet
    tnet, sr = _make_pair()
    del tnet
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.random((1, 32, 32, 3), dtype=np.float32))

    def run(**kw):
        m = FeMaSRNet(codebook_params=CODEBOOK, LQ_stage=True,
                      scale_factor=4, norm_type='gn', act_type='silu',
                      dtype=jnp.float32, **kw)
        out, _, _, idx = m.apply({'params': sr.params}, img)
        return np.asarray(out), np.asarray(idx[0])

    ref, idx_ref = run()
    out, idx = run(int8_swin=True)
    flips = float((idx != idx_ref).mean())
    psnr = 10 * np.log10(
        1.0 / max(float(np.mean((out - ref) ** 2)), 1e-12))
    assert flips < 0.10, f'int8_swin flips too many indices: {flips:.1%}'
    assert psnr > 32.0, f'int8_swin too lossy: {psnr:.1f} dB'

    out2, idx2 = run(int8_swin=True, int8_tail=True, int8_levels=3,
                     int8_enc_up=True)
    flips2 = float((idx2 != idx_ref).mean())
    psnr2 = 10 * np.log10(
        1.0 / max(float(np.mean((out2 - ref) ** 2)), 1e-12))
    assert flips2 < 0.10, f'all-int8 flips too many indices: {flips2:.1%}'
    assert psnr2 > 29.0, f'all-int8 too lossy: {psnr2:.1f} dB'
