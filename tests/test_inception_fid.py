"""InceptionV3-FID backbone: architecture shape audit + converter contract.

The canonical pt_inception weights are unreachable offline (PARITY.md), so
these tests pin everything weight-independent: the layer/channel layout of
the pytorch-fid InceptionV3 (pool3 = 2048-d, known stage widths), and the
converter's exact torch-key contract (round-trips a synthetic state_dict
with the canonical key names/shapes, fails loudly on a missing key).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from femasr_tpu.metrics.inception import (InceptionV3FID,
                                          convert_inception_checkpoint,
                                          expected_torch_keys,
                                          inception_param_mapping)


@pytest.fixture(scope='module')
def init_params():
    model = InceptionV3FID()
    return model, model.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, 75, 75, 3)))['params']


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out['/'.join(prefix + (k,))] = np.asarray(v)
    return out


def test_pool3_feature_shape_and_stage_widths(init_params):
    model, params = init_params
    flat = _flatten(params)
    # stage output widths of the canonical InceptionV3
    # (torchvision/pytorch-fid): Mixed_5b consumes 192, 5c 256, 5d 288,
    # 6a 288, 6b 768, 7a 768, 7b 1280, 7c 2048-in.
    widths = {
        'Mixed_5b/branch1x1/conv/kernel': 192,
        'Mixed_5c/branch1x1/conv/kernel': 256,
        'Mixed_5d/branch1x1/conv/kernel': 288,
        'Mixed_6a/branch3x3/conv/kernel': 288,
        'Mixed_6b/branch1x1/conv/kernel': 768,
        'Mixed_7a/branch3x3_1/conv/kernel': 768,
        'Mixed_7b/branch1x1/conv/kernel': 1280,
        'Mixed_7c/branch1x1/conv/kernel': 2048,
    }
    for key, in_ch in widths.items():
        assert flat[key].shape[2] == in_ch, (key, flat[key].shape)

    out = model.apply({'params': params},
                      jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3)))
    assert out.shape == (2, 2048)
    assert np.isfinite(np.asarray(out)).all()


def test_converter_contract_roundtrip(init_params):
    model, params = init_params
    flat = _flatten(params)
    mapping = inception_param_mapping()
    # every flax param is covered by the mapping
    assert set(flat) == set(mapping)

    # synthesize a torch state_dict with the canonical key names/shapes
    rng = np.random.default_rng(0)
    sd = {}
    for flax_path, torch_key in mapping.items():
        v = rng.standard_normal(flat[flax_path].shape).astype(np.float32)
        if flax_path.endswith('conv/kernel'):
            v = v.transpose(3, 2, 0, 1)  # HWIO -> OIHW
        sd[torch_key] = np.abs(v) + 0.1 if torch_key.endswith(
            'running_var') else v
    # plus the classifier head the real checkpoint carries (must be ignored)
    sd['fc.weight'] = rng.standard_normal((1008, 2048)).astype(np.float32)
    sd['fc.bias'] = np.zeros((1008,), np.float32)

    loaded = convert_inception_checkpoint(sd)
    lflat = _flatten(loaded)
    assert set(lflat) == set(flat)
    for k in flat:
        assert lflat[k].shape == flat[k].shape, k
    np.testing.assert_allclose(
        lflat['Conv2d_1a_3x3/conv/kernel'],
        sd['Conv2d_1a_3x3.conv.weight'].transpose(2, 3, 1, 0))

    out = model.apply({'params': loaded},
                      jax.random.uniform(jax.random.PRNGKey(2), (1, 64, 64, 3)))
    assert out.shape == (1, 2048)

    with pytest.raises(KeyError):
        convert_inception_checkpoint(
            {k: v for k, v in sd.items() if 'Mixed_7c' not in k})


def test_expected_keys_cover_all_blocks():
    keys = expected_torch_keys()
    assert 'Mixed_7c.branch_pool.bn.running_var' in keys
    assert 'Conv2d_4a_3x3.conv.weight' in keys
    assert len(keys) == 94 * 5  # 94 BasicConv2d units x 5 tensors each
