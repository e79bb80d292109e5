import os

import numpy as np
import pytest

from femasr_tpu.utils import (ARCH_REGISTRY, Registry, apply_force_yml,
                              array2img, img2array, make_grid, scandir,
                              yaml_load)


def test_registry_roundtrip():
    reg = Registry('test')

    @reg.register()
    class Foo:
        pass

    assert reg.get('Foo') is Foo
    assert 'Foo' in reg
    with pytest.raises(KeyError):
        reg.get('Bar')
    with pytest.raises(KeyError):
        reg.register(Foo)  # duplicate


def test_global_registries_exist():
    assert ARCH_REGISTRY._name == 'arch'


def test_yaml_load_and_force_yml():
    opt = yaml_load("""
name: exp
scale: &s 4
train:
  total_iter: !!float 2e6
  lr: !!float 1e-4
network_g:
  scale_factor: *s
""")
    assert opt['train']['total_iter'] == 2e6
    assert opt['network_g']['scale_factor'] == 4
    apply_force_yml(opt, ['train:total_iter=100', 'name=other', 'train:lr=5e-5'])
    assert opt['train']['total_iter'] == 100
    assert opt['name'] == 'other'
    assert opt['train']['lr'] == 5e-5


def test_img_array_roundtrip():
    img_bgr = (np.random.default_rng(0).random((8, 10, 3)) * 255).astype(np.uint8)
    arr = img2array(img_bgr.astype(np.float32) / 255.0)
    assert arr.shape == (8, 10, 3)
    # BGR -> RGB swap
    np.testing.assert_allclose(arr[..., 0], img_bgr[..., 2] / 255.0, atol=1e-6)
    back = array2img(arr)
    assert back.dtype == np.uint8
    np.testing.assert_array_equal(back, img_bgr)


def test_make_grid():
    imgs = np.ones((4, 3, 5, 2), dtype=np.float32)
    grid = make_grid(imgs, nrow=2, padding=1)
    assert grid.shape == (2 * 4 + 1, 2 * 6 + 1, 2)


def test_scandir(tmp_path):
    (tmp_path / 'a.png').write_bytes(b'')
    (tmp_path / 'sub').mkdir()
    (tmp_path / 'sub' / 'b.png').write_bytes(b'')
    (tmp_path / 'c.txt').write_bytes(b'')
    flat = sorted(scandir(str(tmp_path), suffix='.png'))
    assert flat == ['a.png']
    rec = sorted(scandir(str(tmp_path), suffix='.png', recursive=True))
    assert rec == ['a.png', os.path.join('sub', 'b.png')]


def test_build_network_yaml_dtype_string():
    """`network_g: {dtype: bfloat16}` enables mixed-precision compute."""
    import jax.numpy as jnp

    from femasr_tpu.models import build_network
    net = build_network({'type': 'UNetDiscriminatorSN', 'num_in_ch': 3,
                         'dtype': 'bfloat16'})
    assert net.dtype == jnp.bfloat16
    net32 = build_network({'type': 'UNetDiscriminatorSN', 'num_in_ch': 3,
                           'dtype': 'float32'})
    assert net32.dtype == jnp.float32
