"""Pallas VQ argmin kernel vs the XLA reference path (interpret mode on CPU;
the same kernel compiles natively on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from femasr_tpu.ops.pallas.vq import vq_argmin
from femasr_tpu.ops.quantize import nearest_code_indices


@pytest.mark.parametrize('n,k,c', [(64, 128, 32), (300, 1024, 512),
                                   (1000, 100, 64)])
def test_vq_argmin_matches_xla(n, k, c):
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(size=(n, c)).astype(np.float32))
    cb = jnp.asarray(rng.normal(size=(k, c)).astype(np.float32))
    ref = nearest_code_indices(z, cb, backend='xla')
    ours = vq_argmin(z, cb, tn=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(ours), np.asarray(ref))


def test_vq_argmin_tie_breaking():
    # duplicate codes: first index must win, like torch/jnp argmin
    cb = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (2, 1)))  # (8, 4)
    z = jnp.asarray(np.eye(4, dtype=np.float32))
    out = vq_argmin(z, cb, tn=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), [0, 1, 2, 3])


def test_vq_argmin_in_quantizer_path():
    from femasr_tpu.ops.quantize import vector_quantize
    rng = np.random.default_rng(1)
    z = jnp.asarray(rng.normal(size=(2, 4, 4, 16)).astype(np.float32))
    cb = jnp.asarray(rng.normal(size=(64, 16)).astype(np.float32))

    import femasr_tpu.ops.pallas.vq as vq_mod
    import functools
    orig = vq_mod.vq_argmin
    # route through interpret mode on CPU
    vq_mod.vq_argmin = functools.partial(orig, interpret=True)
    try:
        z_q_p, loss_p, idx_p = vector_quantize(z, cb, backend='pallas')
    finally:
        vq_mod.vq_argmin = orig
    z_q_x, loss_x, idx_x = vector_quantize(z, cb, backend='xla')
    np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_x))
    np.testing.assert_allclose(np.asarray(z_q_p), np.asarray(z_q_x))
    np.testing.assert_allclose(float(loss_p), float(loss_x))


def test_vq_argmin_chunked_codebook():
    rng = np.random.default_rng(2)
    z = jnp.asarray(rng.normal(size=(200, 64)).astype(np.float32))
    cb = jnp.asarray(rng.normal(size=(1024, 64)).astype(np.float32))
    ref = nearest_code_indices(z, cb, backend='xla')
    ours = vq_argmin(z, cb, tn=128, max_codes_vmem=256, interpret=True)
    np.testing.assert_array_equal(np.asarray(ours), np.asarray(ref))


def test_vq_argmin_lowers_to_mosaic_tpu():
    """Native (non-interpret) lowering through the Mosaic TPU pipeline.

    Interpret mode does not validate Mosaic lowering, VMEM sizing, or the
    (8, 128) tiling constraints; AOT-lowering for the 'tpu' platform from
    the CPU host does (execution on the axon relay is separately gated —
    it hangs the relay's tpu_custom_call path, see CLAUDE.md/NOTES).
    """
    z = jnp.zeros((2048, 512), jnp.float32)
    cb = jnp.zeros((1024, 512), jnp.float32)   # release codebook shape
    traced = jax.jit(lambda z, cb: vq_argmin(z, cb)).trace(z, cb)
    text = traced.lower(lowering_platforms=('tpu',)).as_text()
    assert 'tpu_custom_call' in text


def test_vq_argmin_model_shape_lowers_to_mosaic():
    # 512px x4 inference tile: 65536 tokens against the full codebook
    z = jnp.zeros((65536, 512), jnp.bfloat16)
    cb = jnp.zeros((1024, 512), jnp.float32)
    traced = jax.jit(lambda z, cb: vq_argmin(z, cb)).trace(z, cb)
    assert 'tpu_custom_call' in traced.lower(
        lowering_platforms=('tpu',)).as_text()
