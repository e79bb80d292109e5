"""DiffJPEG: closeness to libjpeg (cv2) and differentiability."""

import cv2
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from femasr_tpu.ops.diffjpeg import jpeg_compress, quality_to_factor


@pytest.fixture
def img(rng):
    # smooth-ish natural-like image: random lowpass
    base = rng.random((8, 8, 3)).astype(np.float32)
    return cv2.resize(base, (64, 64), interpolation=cv2.INTER_CUBIC).clip(0, 1)


@pytest.mark.parametrize('quality', [90, 50, 30])
def test_close_to_cv2_jpeg(img, quality):
    ours = np.asarray(jpeg_compress(jnp.asarray(img)[None], quality,
                                    differentiable=False)[0])

    bgr = cv2.cvtColor((img * 255).round().astype(np.uint8),
                       cv2.COLOR_RGB2BGR)
    _, enc = cv2.imencode('.jpg', bgr, [int(cv2.IMWRITE_JPEG_QUALITY), quality])
    ref = cv2.cvtColor(cv2.imdecode(enc, 1),
                       cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0

    # both are JPEG round-trips; they should agree closely (libjpeg uses
    # integer DCT + different chroma filtering, so not bit-exact)
    assert np.abs(ours - ref).mean() < 0.02
    # and our reconstruction must be closer to cv2's jpeg than to a different
    # quality's output
    _, enc_low = cv2.imencode('.jpg', bgr, [int(cv2.IMWRITE_JPEG_QUALITY), 5])
    ref_low = cv2.cvtColor(cv2.imdecode(enc_low, 1),
                           cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
    assert np.abs(ours - ref).mean() < np.abs(ours - ref_low).mean()


def test_quality_monotonic(img):
    x = jnp.asarray(img)[None]
    errs = [float(jnp.abs(jpeg_compress(x, q, differentiable=False) - x).mean())
            for q in (95, 60, 20)]
    assert errs[0] < errs[1] < errs[2]


def test_quality_factor_values():
    np.testing.assert_allclose(float(quality_to_factor(50)), 1.0)
    np.testing.assert_allclose(float(quality_to_factor(100)), 0.0)
    np.testing.assert_allclose(float(quality_to_factor(25)), 2.0)


def test_differentiable_and_jittable(img):
    x = jnp.asarray(img)[None]

    @jax.jit
    def loss(x, q):
        return jnp.mean(jnp.square(jpeg_compress(x, q) - x))

    g = jax.grad(loss)(x, 50.0)
    assert g.shape == x.shape
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


def test_nonmultiple_of_16_shapes():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 37, 50, 3), dtype=np.float32))
    out = jpeg_compress(x, 80, differentiable=False)
    assert out.shape == x.shape
