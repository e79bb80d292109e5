"""MATLAB-bicubic resize parity vs the reference imresize_np + color utils."""

import numpy as np
import pytest

import jax.numpy as jnp

from femasr_tpu.ops.resize import imresize, imresize_np
from femasr_tpu.utils.matlab_functions import bgr2ycbcr, rgb2ycbcr, ycbcr2rgb


@pytest.fixture(scope='module')
def ref_bsrgan():
    pytest.importorskip('torch')
    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from reference_shim import load_reference_module
    return load_reference_module('basicsr.data.bsrgan_util')


@pytest.mark.parametrize('shape,scale', [((37, 53, 3), 0.25),
                                         ((64, 48, 3), 0.5),
                                         ((17, 23, 3), 2.0),
                                         ((32, 32, 3), 1 / 3)])
def test_imresize_parity(ref_bsrgan, shape, scale):
    rng = np.random.default_rng(0)
    img = rng.random(shape, dtype=np.float32)
    ref = ref_bsrgan.imresize_np(img, scale)
    np.testing.assert_allclose(imresize_np(img, scale), ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(imresize(jnp.asarray(img), scale)),
                               ref, atol=1e-5)


def test_imresize_batched():
    rng = np.random.default_rng(1)
    imgs = rng.random((3, 24, 20, 3), dtype=np.float32)
    out = np.asarray(imresize(jnp.asarray(imgs), 0.5))
    assert out.shape == (3, 12, 10, 3)
    for i in range(3):
        np.testing.assert_allclose(out[i], imresize_np(imgs[i], 0.5), atol=1e-5)


def test_ycbcr_roundtrip_and_reference_values():
    rng = np.random.default_rng(2)
    img = rng.random((8, 9, 3), dtype=np.float32)
    y = rgb2ycbcr(img, y_only=True)
    assert y.shape == (8, 9)
    full = rgb2ycbcr(img)
    np.testing.assert_allclose(full[..., 0], y, atol=1e-5)
    # bgr2ycbcr(img[..., ::-1]) == rgb2ycbcr(img)
    np.testing.assert_allclose(bgr2ycbcr(img[..., ::-1].copy(), y_only=True),
                               y, atol=1e-5)
    # roundtrip
    back = ycbcr2rgb(full)
    np.testing.assert_allclose(back, img, atol=2e-3)
    # known value: white -> Y=235/255 (uint8 convention scaled to [0,1])
    white = np.ones((1, 1, 3), np.float32)
    np.testing.assert_allclose(rgb2ycbcr(white, y_only=True)[0, 0],
                               235.0 / 255.0, atol=1e-3)
