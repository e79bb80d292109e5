"""On-device degradation pipeline: shapes, determinism, statistics vs host."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from femasr_tpu.ops.degradations_jax import (add_gaussian_noise_jax,
                                             add_jpeg_noise_jax,
                                             canvas_rescale,
                                             degradation_bsrgan_jax,
                                             depthwise_blur,
                                             random_gaussian_kernels,
                                             _shuffled_order)


def test_random_kernels_normalized():
    ks = random_gaussian_kernels(jax.random.PRNGKey(0), 8, sf=4)
    assert ks.shape == (8, 25, 25)
    np.testing.assert_allclose(np.asarray(ks.sum(axis=(1, 2))), 1.0,
                               rtol=1e-5)
    assert (np.asarray(ks) >= 0).all()


def test_depthwise_blur_matches_scipy():
    from scipy import ndimage
    rng = np.random.default_rng(0)
    x = rng.random((2, 24, 24, 3), dtype=np.float32)
    k1 = rng.random((9, 9)).astype(np.float32)
    k1 /= k1.sum()
    k2 = rng.random((9, 9)).astype(np.float32)
    k2 /= k2.sum()
    out = np.asarray(depthwise_blur(jnp.asarray(x), jnp.asarray(
        np.stack([k1, k2]))))
    for i, k in enumerate([k1, k2]):
        ref = ndimage.convolve(x[i], k[:, :, None], mode='mirror')
        np.testing.assert_allclose(out[i], ref, atol=1e-5)


def test_shuffled_order_constraint():
    for seed in range(20):
        order = np.asarray(_shuffled_order(jax.random.PRNGKey(seed)))
        assert sorted(order.tolist()) == list(range(7))
        assert list(order).index(2) < list(order).index(3)


def test_canvas_rescale_roundtrip_lowpasses():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
    out = canvas_rescale(x, 0.25, jnp.asarray(1))
    assert out.shape == x.shape
    # strong low-pass: high-frequency energy drops
    def hf_energy(a):
        d = np.diff(np.asarray(a), axis=2)
        return float(np.mean(d ** 2))
    assert hf_energy(out) < 0.3 * hf_energy(x)


def test_gaussian_noise_modes_statistics():
    x = jnp.full((6, 32, 32, 3), 0.5, jnp.float32)
    out = add_gaussian_noise_jax(jax.random.PRNGKey(0), x)
    resid = np.asarray(out) - 0.5
    assert 0 < np.abs(resid).mean() < 0.2


def test_jpeg_noise_per_sample_quality():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.random((4, 32, 32, 3), dtype=np.float32))
    out = add_jpeg_noise_jax(jax.random.PRNGKey(0), x)
    assert out.shape == x.shape
    err = np.abs(np.asarray(out) - np.asarray(x)).mean(axis=(1, 2, 3))
    assert (err > 0).all()


@pytest.mark.parametrize('sf', [2, 4])
def test_degradation_pipeline_shapes_and_determinism(sf):
    rng = np.random.default_rng(3)
    s = 64 * sf
    gt = jnp.asarray(rng.random((2, s, s, 3), dtype=np.float32))
    lq, hq = degradation_bsrgan_jax(jax.random.PRNGKey(0), gt, sf=sf)
    assert lq.shape == (2, 64, 64, 3)
    assert hq.shape == gt.shape
    assert 0.0 <= float(lq.min()) and float(lq.max()) <= 1.0
    # deterministic given the key
    lq2, _ = degradation_bsrgan_jax(jax.random.PRNGKey(0), gt, sf=sf)
    np.testing.assert_array_equal(np.asarray(lq), np.asarray(lq2))
    # different key -> different degradation
    lq3, _ = degradation_bsrgan_jax(jax.random.PRNGKey(1), gt, sf=sf)
    assert np.abs(np.asarray(lq) - np.asarray(lq3)).max() > 1e-3


def test_degradation_statistics_comparable_to_host():
    """The on-device LQ should be roughly as degraded as the host pipeline's
    (same order of magnitude of error vs clean bicubic downsample)."""
    import random as pyrandom

    import cv2

    from femasr_tpu.data.degradations import degradation_bsrgan
    from femasr_tpu.ops.resize import imresize_np

    rng = np.random.default_rng(4)
    base = rng.random((16, 16, 3)).astype(np.float32)
    gt = cv2.resize(base, (256, 256), interpolation=cv2.INTER_CUBIC).clip(0, 1)

    clean = imresize_np(gt, 0.25)

    pyrandom.seed(0)
    np.random.seed(0)
    host_errs = []
    for _ in range(3):
        lq_h, _ = degradation_bsrgan(gt.copy(), sf=4, lq_patchsize=32,
                                     use_crop=False)
        host_errs.append(np.abs(lq_h - clean).mean())

    dev_errs = []
    for seed in range(3):
        lq_d, _ = degradation_bsrgan_jax(jax.random.PRNGKey(seed),
                                         jnp.asarray(gt)[None], sf=4)
        dev_errs.append(np.abs(np.asarray(lq_d[0]) - clean).mean())

    h, d = np.mean(host_errs), np.mean(dev_errs)
    assert d > 0.005, f'device degradation too weak: {d}'
    assert 0.2 < d / h < 5.0, f'device/host degradation mismatch: {d} vs {h}'


def test_dataset_on_device_flag(tmp_path):
    import cv2
    from femasr_tpu.data import BSRGANTrainDataset
    rng = np.random.default_rng(0)
    gt_dir = tmp_path / 'gt'
    gt_dir.mkdir()
    cv2.imwrite(str(gt_dir / 'a.png'),
                (rng.random((160, 160, 3)) * 255).astype(np.uint8))
    ds = BSRGANTrainDataset({'phase': 'train', 'scale': 4,
                             'dataroot_gt': str(gt_dir), 'gt_size': 128,
                             'on_device_degradation': True,
                             'io_backend': {'type': 'disk'}})
    sample = ds[0]
    assert 'lq' not in sample
    assert sample['gt'].shape == (128, 128, 3)
