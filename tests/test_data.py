"""Data layer tests: degradation kernels/ops parity, datasets, loader, sampler."""

import os

import cv2
import numpy as np
import pytest

from femasr_tpu.data import (BSRGANTrainDataset, DataLoader, EnlargedSampler,
                             PairedImageDataset, SingleImageDataset, augment,
                             build_dataloader, build_dataset,
                             degradation_bsrgan, degradation_bsrgan_plus,
                             make_dataset, paired_random_crop)
from femasr_tpu.data.degradations import (add_jpeg_noise,
                                          anisotropic_gaussian_kernel,
                                          fspecial, gen_kernel, shift_pixel)


@pytest.fixture(scope='module')
def ref_bsrgan():
    torch = pytest.importorskip('torch')  # noqa: F841
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from reference_shim import load_reference_module
    return load_reference_module('basicsr.data.bsrgan_util')


def test_anisotropic_kernel_parity(ref_bsrgan):
    for ksize, theta, l1, l2 in [(15, 0.7, 6.0, 2.0), (7, 2.1, 1.0, 1.0),
                                 (21, 3.0, 8.0, 0.5)]:
        ref = ref_bsrgan.anisotropic_Gaussian(ksize, theta, l1, l2)
        ours = anisotropic_gaussian_kernel(ksize, theta, l1, l2)
        np.testing.assert_allclose(ours, ref, atol=1e-10)


def test_fspecial_parity(ref_bsrgan, monkeypatch):
    import scipy
    # the reference uses the long-removed scipy.finfo alias
    monkeypatch.setattr(scipy, 'finfo', np.finfo, raising=False)
    np.testing.assert_allclose(fspecial('gaussian', 25, 1.7),
                               ref_bsrgan.fspecial('gaussian', 25, 1.7),
                               atol=1e-12)
    np.testing.assert_allclose(fspecial('laplacian', 0.3),
                               ref_bsrgan.fspecial('laplacian', 0.3),
                               atol=1e-12)


def test_shift_pixel_vs_scipy_linear():
    # the reference's interp2d is removed from modern scipy; validate against
    # RegularGridInterpolator with the same (linear, clamped) semantics
    from scipy.interpolate import RegularGridInterpolator
    rng = np.random.default_rng(0)
    k = rng.random((25, 25))
    sf = 4
    shift = (sf - 1) * 0.5
    xv = np.arange(25.0)
    interp = RegularGridInterpolator((xv, xv), k, method='linear')
    y1 = np.clip(xv + shift, 0, 24)
    x1 = np.clip(xv + shift, 0, 24)
    yy, xx = np.meshgrid(y1, x1, indexing='ij')
    ref = interp(np.stack([yy, xx], -1))
    ours = shift_pixel(k.copy(), sf)
    np.testing.assert_allclose(ours, ref, atol=1e-10)


def test_gen_kernel_properties():
    k = gen_kernel(rng=np.random.default_rng(0))
    assert k.shape == (15, 15)
    np.testing.assert_allclose(k.sum(), 1.0, rtol=1e-9)
    assert (k >= 0).all()


def test_jpeg_noise_roundtrip():
    rng = np.random.default_rng(0)
    img = rng.random((64, 64, 3), dtype=np.float32)
    out = add_jpeg_noise(img, quality=90)
    assert out.shape == img.shape
    assert out.dtype == np.float32
    assert 0 <= out.min() and out.max() <= 1
    # high quality should be closer than low quality
    out_low = add_jpeg_noise(img, quality=30)
    assert np.abs(out - img).mean() < np.abs(out_low - img).mean()


@pytest.mark.parametrize('sf', [2, 4])
def test_degradation_bsrgan_shapes(sf):
    import random
    random.seed(0)
    np.random.seed(0)
    rng = np.random.default_rng(0)
    img = rng.random((sf * 40, sf * 40, 3), dtype=np.float32)
    lq, hq = degradation_bsrgan(img, sf=sf, lq_patchsize=32)
    assert lq.shape == (32, 32, 3)
    assert hq.shape == (32 * sf, 32 * sf, 3)
    assert 0 <= lq.min() and lq.max() <= 1


def test_degradation_bsrgan_plus_shapes():
    import random
    random.seed(1)
    np.random.seed(1)
    rng = np.random.default_rng(1)
    img = rng.random((160, 160, 3), dtype=np.float32)
    lq, hq = degradation_bsrgan_plus(img, sf=4, lq_patchsize=32)
    assert lq.shape == (32, 32, 3)
    assert hq.shape == (128, 128, 3)


# ---------------------------------------------------------------------------
# datasets / loader / sampler
# ---------------------------------------------------------------------------

@pytest.fixture
def img_tree(tmp_path):
    gt_dir = tmp_path / 'gt'
    lq_dir = tmp_path / 'lq'
    gt_dir.mkdir()
    lq_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(6):
        gt = (rng.random((160, 160, 3)) * 255).astype(np.uint8)
        lq = cv2.resize(gt, (40, 40))
        cv2.imwrite(str(gt_dir / f'im{i}.png'), gt)
        cv2.imwrite(str(lq_dir / f'im{i}.png'), lq)
    return str(gt_dir), str(lq_dir)


def test_paired_dataset_and_loader(img_tree):
    gt_dir, lq_dir = img_tree
    opt = {'type': 'PairedImageDataset', 'phase': 'train', 'scale': 4,
           'dataroot_gt': gt_dir, 'dataroot_lq': lq_dir, 'gt_size': 64,
           'use_resize_crop': True, 'use_flip': True, 'use_rot': True,
           'batch_size_per_gpu': 2, 'num_worker_per_gpu': 2,
           'io_backend': {'type': 'disk'}}
    ds = build_dataset(opt)
    assert len(ds) == 6
    sample = ds[0]
    assert sample['gt'].shape == (64, 64, 3)
    assert sample['lq'].shape == (16, 16, 3)

    loader = build_dataloader(ds, opt, num_gpu=1, seed=0)
    batches = list(loader)
    assert len(batches) == 3
    assert batches[0]['gt'].shape == (2, 64, 64, 3)
    assert batches[0]['lq'].shape == (2, 16, 16, 3)
    assert len(batches[0]['gt_path']) == 2


def test_bsrgan_train_dataset(img_tree):
    gt_dir, _ = img_tree
    opt = {'type': 'BSRGANTrainDataset', 'phase': 'train', 'scale': 4,
           'dataroot_gt': gt_dir, 'gt_size': 128, 'use_resize_crop': True,
           'use_flip': True, 'use_rot': True, 'io_backend': {'type': 'disk'}}
    ds = BSRGANTrainDataset(opt)
    sample = ds[0]
    assert sample['gt'].shape == (128, 128, 3)
    assert sample['lq'].shape == (32, 32, 3)


def test_single_image_dataset(img_tree):
    _, lq_dir = img_tree
    ds = SingleImageDataset({'phase': 'test', 'dataroot_lq': lq_dir})
    assert len(ds) == 6
    assert ds[0]['lq'].shape == (40, 40, 3)


def test_enlarged_sampler_partitions():
    s0 = EnlargedSampler(10, num_replicas=2, rank=0, ratio=2)
    s1 = EnlargedSampler(10, num_replicas=2, rank=1, ratio=2)
    s0.set_epoch(3)
    s1.set_epoch(3)
    i0, i1 = list(s0), list(s1)
    assert len(i0) == len(i1) == 10
    assert all(0 <= i < 10 for i in i0 + i1)
    # same epoch -> deterministic
    s0.set_epoch(3)
    assert list(s0) == i0
    s0.set_epoch(4)
    assert list(s0) != i0


def test_val_loader_batches(img_tree):
    gt_dir, lq_dir = img_tree
    opt = {'type': 'PairedImageDataset', 'phase': 'val', 'scale': 4,
           'dataroot_gt': gt_dir, 'dataroot_lq': lq_dir,
           'io_backend': {'type': 'disk'}}
    ds = PairedImageDataset(opt)
    loader = build_dataloader(ds, opt)
    batch = next(iter(loader))
    assert batch['gt'].shape == (1, 160, 160, 3)


def test_device_prefetcher_order():
    from femasr_tpu.data.loader import DataLoader, DevicePrefetcher

    class Dummy:
        def __len__(self):
            return 5

        def __getitem__(self, i):
            return {'x': np.full((2, 2), i, np.float32)}

    loader = DataLoader(Dummy(), batch_size=1, shuffle=False, num_workers=0)
    staged = []
    pref = DevicePrefetcher(loader, lambda b: (staged.append(True), b)[1])
    vals = [int(b['x'][0, 0, 0]) for b in pref]
    assert vals == [0, 1, 2, 3, 4]
    assert len(staged) == 5


def test_dist_util_surface():
    from femasr_tpu.parallel import get_dist_info, master_only
    rank, world = get_dist_info()
    assert rank == 0 and world == 1
    calls = []

    @master_only
    def record():
        calls.append(1)

    record()
    assert calls == [1]
