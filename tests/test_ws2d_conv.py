"""Parity tests for the ws2d decoder-tail path (ops/pallas/ws2d_conv.py).

The kernel evaluates the HR 3x3 SAME conv on the width-space-to-depth
form (B, H, W/2, 2C); these tests pin it (interpret mode on CPU) against
the plain NHWC conv, the GroupNormWs2D statistics against GroupNorm, and
the full ws2d_tail model against the baseline decoder — the same
checkpoint drives both (param trees are interchangeable by design).

Reference anchor: the tail being re-formulated is
/root/reference/basicsr/archs/femasr_arch.py:195-211 at the finest scale.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from femasr_tpu.ops.layers import GroupNormWs2D, from_ws2d, to_ws2d
from femasr_tpu.ops.layers import GroupNorm
from femasr_tpu.ops.pallas.ws2d_conv import conv3_ws2d, ws2d_blocks


def _ref_conv(x, k, b):
    y = jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    return y + b


def _rand(rng, *shape):
    return jnp.asarray(rng.randn(*shape), jnp.float32)


@pytest.mark.parametrize('h,w,ci,co', [(8, 16, 4, 4), (10, 26, 5, 3),
                                       (16, 16, 64, 64)])
def test_conv3_ws2d_matches_nhwc(h, w, ci, co):
    rng = np.random.RandomState(0)
    x = _rand(rng, 1, h, w, ci)
    k = _rand(rng, 3, 3, ci, co) * 0.1
    b = _rand(rng, co) * 0.1
    ref = _ref_conv(x, k, b)
    got = from_ws2d(conv3_ws2d(to_ws2d(x), k, b))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_conv3_ws2d_row_strip_padding():
    # h not a multiple of any th candidate exercises the h_pad path
    rng = np.random.RandomState(1)
    x = _rand(rng, 1, 7, 10, 3)
    k = _rand(rng, 3, 3, 3, 5) * 0.1
    b = _rand(rng, 5) * 0.1
    ref = _ref_conv(x, k, b)
    got = from_ws2d(conv3_ws2d(to_ws2d(x), k, b, th=4))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_conv3_ws2d_batch():
    rng = np.random.RandomState(2)
    x = _rand(rng, 2, 8, 12, 4)
    k = _rand(rng, 3, 3, 4, 4) * 0.1
    b = _rand(rng, 4) * 0.1
    ref = _ref_conv(x, k, b)
    got = from_ws2d(conv3_ws2d(to_ws2d(x), k, b))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_conv3_ws2d_6dot_matches_9dot(monkeypatch):
    # the packed-edge 6-dot form (env-gated: its lane concat is
    # Not-implemented on the relay's Mosaic) vs the default 9-dot form,
    # both against the NHWC reference
    rng = np.random.RandomState(9)
    x = _rand(rng, 1, 8, 16, 64)
    k = _rand(rng, 3, 3, 64, 64) * 0.05
    b = _rand(rng, 64) * 0.05
    ref = _ref_conv(x, k, b)
    monkeypatch.setenv('FEMASR_WS2D_DOTS', '6')
    got6 = from_ws2d(conv3_ws2d(to_ws2d(x), k, b, th=4))
    monkeypatch.setenv('FEMASR_WS2D_DOTS', '9')
    got9 = from_ws2d(conv3_ws2d(to_ws2d(x), k, b, th=8))
    np.testing.assert_allclose(np.asarray(got6), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got9), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_conv3_ws2d_fused_silu():
    rng = np.random.RandomState(3)
    x = _rand(rng, 1, 8, 8, 4)
    k = _rand(rng, 3, 3, 4, 4) * 0.1
    b = _rand(rng, 4) * 0.1
    ref = jax.nn.silu(_ref_conv(x, k, b))
    got = from_ws2d(conv3_ws2d(to_ws2d(x), k, b, act='silu'))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_ws2d_blocks_structure():
    # each HR tap appears exactly once per OUTPUT phase (so nonzero
    # entries = 2 x 9 x I x O; the dense dots are 2x HR MACs as the
    # kernel docstring states — at full 128-lane MXU width)
    rng = np.random.RandomState(4)
    k = _rand(rng, 3, 3, 2, 3)
    blocks = ws2d_blocks(k)
    assert blocks.shape == (9, 4, 6)
    nz = sum(float(jnp.sum(jnp.abs(b) > 0)) for b in blocks)
    assert nz == 2 * 9 * 2 * 3


@pytest.mark.parametrize('h,w,ci,co', [(6, 8, 4, 4), (9, 13, 5, 3)])
def test_upconv3_ws2d_matches_composite(h, w, ci, co):
    from femasr_tpu.ops.layers import upconv3_ws2d, upsample_nearest
    rng = np.random.RandomState(7)
    x = _rand(rng, 1, h, w, ci)
    k = _rand(rng, 3, 3, ci, co) * 0.1
    b = _rand(rng, co) * 0.1
    ref = to_ws2d(_ref_conv(upsample_nearest(x, 2), k, b))
    got = upconv3_ws2d(x, k, b)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize('h,w,ci,co', [(6, 8, 4, 4), (5, 12, 3, 5)])
def test_upconv3_ws2d2_matches_composite(h, w, ci, co):
    from femasr_tpu.ops.layers import upconv3_ws2d2, upsample_nearest
    rng = np.random.RandomState(8)
    x = _rand(rng, 1, h, w, ci)
    k = _rand(rng, 3, 3, ci, co) * 0.1
    b = _rand(rng, co) * 0.1
    ref = to_ws2d(_ref_conv(upsample_nearest(x, 2), k, b))
    got = upconv3_ws2d2(to_ws2d(x), k, b)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_groupnorm_ws2d_matches_groupnorm():
    rng = np.random.RandomState(5)
    c = 64
    x = _rand(rng, 1, 8, 12, c) * 3 + 1.5
    gn = GroupNorm(num_groups=32)
    params = gn.init(jax.random.PRNGKey(0), x)
    # random affine so the test covers scale/bias threading
    params = jax.tree.map(
        lambda p: jnp.asarray(rng.randn(*p.shape), p.dtype), params)
    ref = gn.apply(params, x)
    got = from_ws2d(GroupNormWs2D(num_groups=32).apply(params, to_ws2d(x)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize('levels,enc_up', [(1, False), (2, False),
                                           (2, True)])
def test_ws2d_tail_model_parity(levels, enc_up):
    """Same checkpoint through baseline and ws2d_tail decoders (f32)."""
    from femasr_tpu.models import FeMaSRNet

    kw = dict(codebook_params=[[32, 16, 32]], LQ_stage=True,
              scale_factor=4, norm_type='gn', act_type='silu',
              dtype=jnp.float32)
    base = FeMaSRNet(**kw)
    ws2d = FeMaSRNet(ws2d_tail=True, ws2d_levels=levels,
                     ws2d_enc_up=enc_up, **kw)
    x = jnp.asarray(np.random.RandomState(6).rand(1, 32, 32, 3),
                    jnp.float32)
    params = base.init(jax.random.PRNGKey(0), x)['params']
    # param trees interchange by construction
    jax.tree.map(lambda a, b: None, params,
                 ws2d.init(jax.random.PRNGKey(0), x)['params'])
    out_b = base.apply({'params': params}, x)[0]
    out_w = ws2d.apply({'params': params}, x)[0]
    assert out_w.shape == out_b.shape
    np.testing.assert_allclose(np.asarray(out_w), np.asarray(out_b),
                               rtol=5e-4, atol=5e-4)
