"""Fused Pallas w8a8 kernels vs the XLA w8a8 path (interpret mode on CPU;
Mosaic TPU lowering checked separately — execution on the axon relay is
gated, see CLAUDE.md)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from femasr_tpu.ops.layers import conv3_w8a8 as conv3_w8a8_xla
from femasr_tpu.ops.layers import dense_w8a8 as dense_w8a8_xla
from femasr_tpu.ops.pallas.int8_dense import conv3_w8a8, matmul_w8a8


@pytest.mark.parametrize('m,k,n', [(64, 32, 48), (300, 256, 768),
                                   (128, 512, 128)])
def test_matmul_w8a8_matches_xla(m, k, n):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(k, n)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(n,)).astype(np.float32))
    ref = dense_w8a8_xla(x, w, b)
    ours = matmul_w8a8(x, w, b, tm=128, tn=128, interpret=True)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_matmul_w8a8_no_bias_bf16_leading_dims():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 7, 96)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(96, 64)).astype(np.float32))
    ref = dense_w8a8_xla(x, w, None)
    ours = matmul_w8a8(x, w, None, tm=128, tn=128, interpret=True)
    assert ours.dtype == jnp.bfloat16 and ours.shape == (2, 7, 64)
    np.testing.assert_allclose(
        np.asarray(ours, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2)


def test_matmul_w8a8_fused_gelu():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(64, 128)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(128, 64)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(64,)).astype(np.float32))
    ref = jax.nn.gelu(dense_w8a8_xla(x, w, b), approximate=True)
    ours = matmul_w8a8(x, w, b, act='gelu', tm=64, tn=64, interpret=True)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize('h,w,ci,co', [(8, 8, 16, 24), (13, 9, 8, 8)])
def test_conv3_w8a8_matches_xla(h, w, ci, co):
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, h, w, ci)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, ci, co)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(co,)).astype(np.float32))
    ref = conv3_w8a8_xla(x, k, b)
    ours = conv3_w8a8(x, k, b, th=4, interpret=True)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_conv3_w8a8_batched_and_fused_silu():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 8)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 8, 8)).astype(np.float32))
    y_ref = conv3_w8a8_xla(x, k, None)
    ref = y_ref * jax.nn.sigmoid(y_ref)
    ours = conv3_w8a8(x, k, None, act='silu', th=4, interpret=True)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_int8_backend_env_routes_through_model(monkeypatch):
    """FEMASR_INT8_BACKEND=pallas must produce the XLA int8 path's numbers
    end-to-end through the int8_tail model (same quant semantics, int32
    accumulation is exact -> near-bitwise equality)."""
    from femasr_tpu.models import FeMaSRNet
    rng = np.random.default_rng(7)
    img = jnp.asarray(rng.random((1, 16, 16, 3), dtype=np.float32))
    m = FeMaSRNet(codebook_params=[[8, 32, 16]], LQ_stage=True,
                  scale_factor=4, gt_resolution=64, norm_type='gn',
                  act_type='silu', dtype=jnp.float32, int8_tail=True)
    params = m.init(jax.random.PRNGKey(0), img)['params']

    # Both sides under jit: eager-vs-jit f32 ULP differences upstream of
    # the VQ argmin flip code indices (a discontinuity), which would
    # dominate any int8 comparison. The env var is read at trace time, so
    # two separately-jitted lambdas trace two distinct programs that are
    # identical up to the int8 backend.
    monkeypatch.delenv('FEMASR_INT8_BACKEND', raising=False)
    ref, _, _, _ = jax.jit(
        lambda p, x: m.apply({'params': p}, x))(params, img)
    monkeypatch.setenv('FEMASR_INT8_BACKEND', 'pallas')
    out, _, _, _ = jax.jit(
        lambda p, x: m.apply({'params': p}, x))(params, img)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_matmul_w8a8_lowers_to_mosaic_tpu():
    """Swin-linear shapes at the 512px serving point: 16384 tokens,
    qkv 256->768 (network_swinir.py:114 replacement at int8 rate)."""
    x = jnp.zeros((16384, 256), jnp.bfloat16)
    w = jnp.zeros((256, 768), jnp.float32)
    b = jnp.zeros((768,), jnp.float32)
    traced = jax.jit(
        lambda x, w, b: matmul_w8a8(x, w, b, interpret=False)).trace(x, w, b)
    assert 'tpu_custom_call' in traced.lower(
        lowering_platforms=('tpu',)).as_text()


def test_conv3_w8a8_lowers_to_mosaic_tpu():
    """Decoder-tail shape for a 512px x4 tile: 2048x2048x64 -> 64
    (femasr_arch.py:195-211 replacement at int8 rate). th=8 keeps the
    halo window + int32 accumulator within the ~16 MB VMEM budget."""
    x = jnp.zeros((1, 2048, 2048, 64), jnp.bfloat16)
    k = jnp.zeros((3, 3, 64, 64), jnp.float32)
    b = jnp.zeros((64,), jnp.float32)
    traced = jax.jit(
        lambda x, k, b: conv3_w8a8(x, k, b, act='silu',
                                   interpret=False)).trace(x, k, b)
    assert 'tpu_custom_call' in traced.lower(
        lowering_platforms=('tpu',)).as_text()


# ---------------------------------------------------------------------------
# per-token int8 chain (round-4: the per-tensor integration measured a byte
# BLOWUP on chip — 97.3 -> 151.8/174.5 GB; the chain keeps int8 across ops)
# ---------------------------------------------------------------------------

from femasr_tpu.ops.layers import dense_w8a8_ptok, quantize_rows
from femasr_tpu.ops.pallas.int8_dense import matmul_w8a8_q


def test_dense_ptok_xla_matches_float_reference():
    # per-token scales must be at least as accurate as the per-tensor path
    rng = np.random.default_rng(10)
    x = jnp.asarray(rng.normal(size=(256, 96)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(96, 64)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(64,)).astype(np.float32))
    ref = x @ w + b
    x_q, s_x = quantize_rows(x)
    out = dense_w8a8_ptok(x_q, s_x, w, b, out_dtype=jnp.float32)
    err_tok = float(jnp.max(jnp.abs(out - ref)))
    err_tensor = float(jnp.max(jnp.abs(dense_w8a8_xla(x, w, b) - ref)))
    assert err_tok <= err_tensor * 1.5 + 1e-6
    # int8 quantization noise bound: |err| ~ s_x*s_w*O(sqrt(K)) per element
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0.2, atol=0.5)


@pytest.mark.parametrize('m,k,n', [(64, 96, 48), (300, 256, 1024)])
@pytest.mark.parametrize('out_int8', [False, True])
def test_matmul_w8a8_q_matches_xla_ptok(m, k, n, out_int8):
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(k, n)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(n,)).astype(np.float32))
    x_q, s_x = quantize_rows(x)
    ref = dense_w8a8_ptok(x_q, s_x, w, b, act='gelu', out_int8=out_int8,
                          out_dtype=jnp.float32)
    ours = matmul_w8a8_q(x_q, s_x, w, b, act='gelu', out_int8=out_int8,
                         out_dtype=jnp.float32, tm=128, interpret=True)
    if out_int8:
        # identical integer outputs + identical row scales: both backends
        # run the same f32 op sequence on exact int32 accumulators
        np.testing.assert_array_equal(np.asarray(ours[0]),
                                      np.asarray(ref[0]))
        np.testing.assert_allclose(np.asarray(ours[1]), np.asarray(ref[1]),
                                   rtol=1e-6, atol=0)
    else:
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)


def test_matmul_w8a8_q_two_link_chain_matches_xla():
    # fc1(gelu, int8 out) -> fc2: the swin MLP chain, pallas vs XLA ptok
    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.normal(size=(200, 64)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(size=(64, 256)).astype(np.float32))
    b1 = jnp.asarray(rng.normal(size=(256,)).astype(np.float32))
    w2 = jnp.asarray(rng.normal(size=(256, 64)).astype(np.float32))
    b2 = jnp.asarray(rng.normal(size=(64,)).astype(np.float32))
    x_q, s_x = quantize_rows(x)
    h_ref = dense_w8a8_ptok(x_q, s_x, w1, b1, act='gelu', out_int8=True)
    ref = dense_w8a8_ptok(h_ref[0], h_ref[1], w2, b2,
                          out_dtype=jnp.float32)
    h = matmul_w8a8_q(x_q, s_x, w1, b1, act='gelu', out_int8=True,
                      tm=64, interpret=True)
    out = matmul_w8a8_q(h[0], h[1], w2, b2, out_dtype=jnp.float32,
                        tm=64, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_int8_chain_env_routes_through_mlp(monkeypatch):
    """FEMASR_INT8_CHAIN=1 through the swin Mlp module: same params as the
    plain path, xla and pallas chain backends agree, quality within
    int8 tolerance of the f32 Mlp."""
    from femasr_tpu.ops.swin import Mlp
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.normal(size=(1, 128, 96)).astype(np.float32))
    m_f32 = Mlp(hidden_features=384, out_features=96, dtype=jnp.float32)
    params = m_f32.init(jax.random.PRNGKey(0), x)['params']
    ref = m_f32.apply({'params': params}, x)

    m_int8 = Mlp(hidden_features=384, out_features=96, int8=True,
                 dtype=jnp.float32)
    monkeypatch.setenv('FEMASR_INT8_CHAIN', '1')
    monkeypatch.delenv('FEMASR_INT8_BACKEND', raising=False)
    out_xla = jax.jit(
        lambda p, x: m_int8.apply({'params': p}, x))(params, x)
    monkeypatch.setenv('FEMASR_INT8_BACKEND', 'pallas')
    out_pallas = jax.jit(
        lambda p, x: m_int8.apply({'params': p}, x))(params, x)
    np.testing.assert_allclose(np.asarray(out_pallas), np.asarray(out_xla),
                               rtol=1e-5, atol=1e-5)
    # int8 quantization noise bound vs f32 (per-token scales, 2 links)
    rel = (np.abs(np.asarray(out_xla) - np.asarray(ref)).max()
           / (np.abs(np.asarray(ref)).max() + 1e-9))
    assert rel < 0.1, rel


def test_matmul_w8a8_q_lowers_to_mosaic_tpu():
    """The swin MLP chain at the 512px serving point: fc1 with int8-out
    epilogue (16384 tokens, 256->1024 + GELU) and fc2 consuming int8
    (1024->256) — network_swinir.py:14-30 replacement at int8 I/O."""
    xq = jnp.zeros((16384, 256), jnp.int8)
    sx = jnp.zeros((16384, 1), jnp.float32)
    w1 = jnp.zeros((256, 1024), jnp.float32)
    b1 = jnp.zeros((1024,), jnp.float32)

    def fc1(xq, sx, w, b):
        return matmul_w8a8_q(xq, sx, w, b, act='gelu', out_int8=True,
                             interpret=False)
    txt = jax.jit(fc1).trace(xq, sx, w1, b1).lower(
        lowering_platforms=('tpu',)).as_text()
    assert 'tpu_custom_call' in txt

    hq = jnp.zeros((16384, 1024), jnp.int8)
    sh = jnp.zeros((16384, 1), jnp.float32)
    w2 = jnp.zeros((1024, 256), jnp.float32)
    b2 = jnp.zeros((256,), jnp.float32)

    def fc2(hq, sh, w, b):
        return matmul_w8a8_q(hq, sh, w, b, interpret=False)
    txt = jax.jit(fc2).trace(hq, sh, w2, b2).lower(
        lowering_platforms=('tpu',)).as_text()
    assert 'tpu_custom_call' in txt
