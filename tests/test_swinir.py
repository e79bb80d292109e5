"""Full SwinIR model parity vs the reference network_swinir.SwinIR."""

import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from femasr_tpu.models.convert import merge_params, state_dict_to_numpy
from femasr_tpu.models.swinir_arch import (SwinIR, convert_swinir_checkpoint,
                                           pixel_shuffle, pixel_unshuffle)
from reference_shim import load_reference_module


def to_nhwc(t):
    return np.ascontiguousarray(t.detach().numpy().transpose(0, 2, 3, 1))


def test_pixel_shuffle_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.random((2, 4, 5, 12), dtype=np.float32)
    ref = torch.nn.functional.pixel_shuffle(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), 2)
    out = pixel_shuffle(jnp.asarray(x), 2)
    np.testing.assert_allclose(np.asarray(out), to_nhwc(ref), atol=1e-6)
    back = pixel_unshuffle(out, 2)
    np.testing.assert_allclose(np.asarray(back), x, atol=1e-6)


@pytest.mark.parametrize('upsampler,upscale', [
    ('pixelshuffledirect', 2),
    ('pixelshuffle', 4),
    ('nearest+conv', 4),
    ('', 1),
])
def test_swinir_parity(upsampler, upscale):
    swinir_ref = load_reference_module('basicsr.archs.network_swinir')
    torch.manual_seed(0)
    kwargs = dict(upscale=upscale, img_size=16, window_size=4,
                  img_range=1., depths=[2, 2], embed_dim=32,
                  num_heads=[4, 4], mlp_ratio=2, upsampler=upsampler,
                  patch_size=1, drop_path_rate=0.0)
    tnet = swinir_ref.SwinIR(**kwargs).eval()
    sd = state_dict_to_numpy(tnet.state_dict())
    loaded = convert_swinir_checkpoint(sd, depths=(2, 2),
                                       upsampler=upsampler)

    jnet = SwinIR(upscale=upscale, img_size=16, window_size=4,
                  depths=(2, 2), embed_dim=32, num_heads=(4, 4),
                  mlp_ratio=2, upsampler=upsampler)
    x = torch.rand(1, 3, 14, 18)  # non-multiple of window: exercises padding
    with torch.no_grad():
        ref = tnet(x)

    xj = jnp.asarray(to_nhwc(x))
    init = jnet.init(jax.random.PRNGKey(0), xj)
    params = merge_params(init['params'], loaded)
    out = jnet.apply({'params': params}, xj)
    assert out.shape == (1, 14 * upscale, 18 * upscale, 3)
    np.testing.assert_allclose(np.asarray(out), to_nhwc(ref), atol=3e-4,
                               rtol=1e-4)
