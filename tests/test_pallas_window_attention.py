"""Pallas fused window-attention kernel vs the XLA path (interpret on CPU)
plus native Mosaic TPU lowering (AOT, no TPU needed)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from femasr_tpu.ops.pallas.window_attention import window_attention_fused


def _xla_reference(q, k, v, bias, mask, nh):
    b_, n, c = q.shape
    hd = c // nh
    qh = q.reshape(b_, n, nh, hd)
    kh = k.reshape(b_, n, nh, hd)
    vh = v.reshape(b_, n, nh, hd)
    attn = jnp.einsum('bnhd,bmhd->bhnm', qh, kh,
                      preferred_element_type=jnp.float32)
    attn = attn + bias[None].astype(jnp.float32)
    if mask is not None:
        attn = attn + mask[:, None].astype(jnp.float32)
    attn = jax.nn.softmax(attn, axis=-1).astype(q.dtype)
    return jnp.einsum('bhnm,bmhd->bnhd', attn, vh).reshape(b_, n, c)


@pytest.mark.parametrize('with_mask', [False, True])
def test_window_attention_matches_xla(with_mask):
    rng = np.random.default_rng(0)
    b_, n, nh, hd = 32, 64, 8, 32
    c = nh * hd
    q = jnp.asarray(rng.normal(size=(b_, n, c)).astype(np.float32)) * 0.2
    k = jnp.asarray(rng.normal(size=(b_, n, c)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b_, n, c)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(nh, n, n)).astype(np.float32)) * 0.1
    mask = None
    if with_mask:
        m = np.zeros((b_, n, n), np.float32)
        m[::3, :, ::2] = -100.0
        mask = jnp.asarray(m)
    ref = _xla_reference(q, k, v, bias, mask, nh)
    out = window_attention_fused(q, k, v, bias, mask, num_heads=nh, tw=16,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-6, rtol=2e-6)


def test_window_attention_lowers_to_mosaic_tpu():
    """Model shape (512px tile: 1024 windows) lowers through Mosaic."""
    b_, n, c, nh = 1024, 64, 256, 8
    q = jnp.zeros((b_, n, c), jnp.bfloat16)
    bias = jnp.zeros((nh, n, n), jnp.float32)
    mask = jnp.zeros((b_, n, n), jnp.bfloat16)

    def f(q, bias, mask):
        return window_attention_fused(q, q, q, bias, mask, num_heads=nh)

    traced = jax.jit(f).trace(q, bias, mask)
    assert 'tpu_custom_call' in traced.lower(
        lowering_platforms=('tpu',)).as_text()


def test_swin_rstb_pallas_backend_matches_xla(monkeypatch):
    """RSTB(attn_backend='pallas') == default on the same params (interpret)."""
    import functools

    from femasr_tpu.ops.pallas import window_attention as wa
    from femasr_tpu.ops.swin import RSTB

    orig = wa.window_attention_fused
    monkeypatch.setattr(wa, 'window_attention_fused',
                        functools.partial(orig, interpret=True))

    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 16, 16, 64))
    blk = RSTB(dim=64, input_resolution=(16, 16), depth=2, num_heads=4,
               window_size=8)
    params = blk.init(jax.random.PRNGKey(1), x)['params']
    ref = blk.apply({'params': params}, x)
    blk_p = RSTB(dim=64, input_resolution=(16, 16), depth=2, num_heads=4,
                 window_size=8, attn_backend='pallas')
    out = blk_p.apply({'params': params}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-6, rtol=3e-6)
