"""Loss parity vs the reference torch losses + LPIPS formula validation."""

import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from femasr_tpu.losses import (GANLoss, L1Loss, MSELoss, CharbonnierLoss,
                               WeightedTVLoss, LPIPS, build_loss)
from reference_shim import load_reference_module


@pytest.fixture(scope='module')
def ref_losses():
    return load_reference_module('basicsr.losses.losses')


def nchw(a):
    return torch.from_numpy(np.asarray(a).transpose(0, 3, 1, 2))


@pytest.mark.parametrize('cls,refname', [(L1Loss, 'L1Loss'),
                                         (MSELoss, 'MSELoss'),
                                         (CharbonnierLoss, 'CharbonnierLoss')])
def test_pixel_losses_parity(ref_losses, cls, refname):
    rng = np.random.default_rng(0)
    pred = rng.random((2, 8, 8, 3), dtype=np.float32)
    tgt = rng.random((2, 8, 8, 3), dtype=np.float32)
    w = rng.random((2, 8, 8, 3), dtype=np.float32)

    ours = cls(loss_weight=0.7)
    ref = getattr(ref_losses, refname)(loss_weight=0.7)
    np.testing.assert_allclose(
        float(ours(jnp.asarray(pred), jnp.asarray(tgt))),
        float(ref(nchw(pred), nchw(tgt))), rtol=1e-5)
    np.testing.assert_allclose(
        float(ours(jnp.asarray(pred), jnp.asarray(tgt), weight=jnp.asarray(w))),
        float(ref(nchw(pred), nchw(tgt), weight=nchw(w))), rtol=1e-5)


def test_tv_loss_parity(ref_losses):
    rng = np.random.default_rng(1)
    pred = rng.random((2, 7, 9, 3), dtype=np.float32)
    ours = WeightedTVLoss(loss_weight=2.0)
    ref = ref_losses.WeightedTVLoss(loss_weight=2.0)
    np.testing.assert_allclose(float(ours(jnp.asarray(pred))),
                               float(ref(nchw(pred))), rtol=1e-5)


@pytest.mark.parametrize('gan_type', ['vanilla', 'lsgan', 'wgan',
                                      'wgan_softplus', 'hinge'])
@pytest.mark.parametrize('target_is_real', [True, False])
@pytest.mark.parametrize('is_disc', [True, False])
def test_gan_loss_parity(ref_losses, gan_type, target_is_real, is_disc):
    rng = np.random.default_rng(2)
    pred = rng.normal(size=(2, 4, 4, 1)).astype(np.float32)
    ours = GANLoss(gan_type, loss_weight=0.1)
    ref = ref_losses.GANLoss(gan_type, loss_weight=0.1)
    np.testing.assert_allclose(
        float(ours(jnp.asarray(pred), target_is_real, is_disc)),
        float(ref(nchw(pred), target_is_real, is_disc)), rtol=1e-5, atol=1e-7)


def test_build_loss_from_yaml_opts():
    loss = build_loss({'type': 'GANLoss', 'gan_type': 'hinge',
                       'real_label_val': 1.0, 'fake_label_val': 0.0,
                       'loss_weight': 0.1})
    assert isinstance(loss, GANLoss)
    assert loss.loss_weight == 0.1


def test_vgg_bn_variant_parity():
    """vgg11_bn: converter + _FrozenBatchNorm match a literal torch mirror
    of torchvision's conv/bn(eval)/relu/pool features layout."""
    import torch.nn.functional as F
    from femasr_tpu.models.vgg_arch import (VGG_CFGS, VGGFeatureExtractor,
                                            convert_vgg_checkpoint)
    rng = np.random.default_rng(4)
    sd, layers = {}, []
    feat_idx, in_ch = 0, 3
    for v in VGG_CFGS['vgg11']:
        if v == 'M':
            layers.append(('pool', feat_idx))
            feat_idx += 1
            continue
        sd[f'features.{feat_idx}.weight'] = (
            rng.normal(size=(v, in_ch, 3, 3)).astype(np.float32) * 0.1)
        sd[f'features.{feat_idx}.bias'] = (
            rng.normal(size=(v,)).astype(np.float32) * 0.1)
        layers.append(('conv', feat_idx))
        feat_idx += 1
        sd[f'features.{feat_idx}.weight'] = (
            rng.random(v).astype(np.float32) + 0.5)
        sd[f'features.{feat_idx}.bias'] = (
            rng.normal(size=(v,)).astype(np.float32) * 0.1)
        sd[f'features.{feat_idx}.running_mean'] = (
            rng.normal(size=(v,)).astype(np.float32) * 0.1)
        sd[f'features.{feat_idx}.running_var'] = (
            rng.random(v).astype(np.float32) + 0.5)
        layers.append(('bn', feat_idx))
        feat_idx += 1
        layers.append(('relu', feat_idx))
        feat_idx += 1
        in_ch = v

    params = convert_vgg_checkpoint(sd, 'vgg11_bn')
    x = rng.random((1, 32, 32, 3), dtype=np.float32)
    ext = VGGFeatureExtractor(layer_name_list=['pool5'], vgg_type='vgg11_bn',
                              use_input_norm=False)
    out = ext.apply({'params': params}, jnp.asarray(x))['pool5']

    t = nchw(x)
    for kind, i in layers:
        if kind == 'conv':
            t = F.conv2d(t, torch.from_numpy(sd[f'features.{i}.weight']),
                         torch.from_numpy(sd[f'features.{i}.bias']),
                         padding=1)
        elif kind == 'bn':
            t = F.batch_norm(
                t, torch.from_numpy(sd[f'features.{i}.running_mean']),
                torch.from_numpy(sd[f'features.{i}.running_var']),
                torch.from_numpy(sd[f'features.{i}.weight']),
                torch.from_numpy(sd[f'features.{i}.bias']),
                training=False, eps=1e-5)
            t = F.relu(t)
        elif kind == 'pool':
            t = F.max_pool2d(t, 2)
    ref = t.numpy().transpose(0, 2, 3, 1)
    # magnitudes grow ~1e4 through 8 random conv+bn layers; compare
    # relatively (f32 reduction-order noise scales with the values)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=1e-2)


def test_lpips_formula_against_torch_mirror():
    """Validate the LPIPS computation graph with random weights against a
    literal torch implementation of the published formula."""
    import torch.nn.functional as F

    rng = np.random.default_rng(3)
    x = rng.random((1, 16, 16, 3), dtype=np.float32)
    y = rng.random((1, 16, 16, 3), dtype=np.float32)

    model = LPIPS()
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(y))
    dist = model.apply(params, jnp.asarray(x), jnp.asarray(y))

    # torch mirror using the SAME (converted-back) random weights
    from femasr_tpu.losses.lpips import (LPIPS_SHIFT, LPIPS_SCALE,
                                         LPIPS_VGG_LAYERS)
    from femasr_tpu.models.vgg_arch import vgg_layer_names
    p = params['params']

    def torch_vgg_feats(img_nchw):
        names = vgg_layer_names('vgg16')
        out = {}
        t = img_nchw
        for name in names:
            if name.startswith('conv'):
                w = torch.from_numpy(
                    np.asarray(p['net'][name]['kernel']).transpose(3, 2, 0, 1).copy())
                b = torch.from_numpy(np.asarray(p['net'][name]['bias']).copy())
                t = F.conv2d(t, w, b, padding=1)
            elif name.startswith('relu'):
                t = F.relu(t)
            elif name.startswith('pool'):
                t = F.max_pool2d(t, 2)
            if name in LPIPS_VGG_LAYERS:
                out[name] = t
                if name == LPIPS_VGG_LAYERS[-1]:
                    break
        return out

    def scale(img):
        img = img * 2 - 1
        shift = torch.from_numpy(LPIPS_SHIFT.reshape(1, 3, 1, 1).copy())
        sc = torch.from_numpy(LPIPS_SCALE.reshape(1, 3, 1, 1).copy())
        return (img - shift) / sc

    fx = torch_vgg_feats(scale(nchw(x)))
    fy = torch_vgg_feats(scale(nchw(y)))
    total = 0.0
    for i, layer in enumerate(LPIPS_VGG_LAYERS):
        nx = fx[layer] / (fx[layer].square().sum(1, keepdim=True).sqrt() + 1e-10)
        ny = fy[layer] / (fy[layer].square().sum(1, keepdim=True).sqrt() + 1e-10)
        d2 = (nx - ny).square()
        lw = torch.from_numpy(np.asarray(p[f'lin{i}']).copy()).reshape(1, -1, 1, 1)
        total = total + (d2 * lw).sum(1).mean()

    np.testing.assert_allclose(float(dist[0]), float(total), rtol=1e-4)


def test_lpips_against_real_package():
    """Diff the JAX LPIPS port against the actual `lpips` pip package
    (bundled lin weights + torchvision vgg16), when available.

    This is the final-word check PARITY.md's 'local mirror' caveat defers
    to; the package is absent in the zero-egress build container, so the
    test skips there (recorded blocker, VERDICT round-2 item 6) and runs
    automatically on any machine that has it.
    """
    pytest.importorskip('lpips')
    import lpips as lpips_pkg

    try:
        ref = lpips_pkg.LPIPS(net='vgg', verbose=False)
    except Exception as e:  # torchvision backbone download blocked
        pytest.skip(f'lpips package present but backbone unavailable: {e}')
    ref.eval()

    from femasr_tpu.losses.lpips import convert_lpips_checkpoint
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = {'params': convert_lpips_checkpoint(sd)}
    assert 'net' in params['params'], 'backbone not embedded in state_dict'

    rng = np.random.default_rng(7)
    x = rng.random((2, 32, 32, 3), dtype=np.float32)
    y = rng.random((2, 32, 32, 3), dtype=np.float32)
    ours = LPIPS().apply(params, jnp.asarray(x), jnp.asarray(y))

    with torch.no_grad():
        # the package expects [-1, 1] NCHW
        theirs = ref(nchw(x) * 2 - 1, nchw(y) * 2 - 1).reshape(-1)
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), rtol=1e-4,
                               atol=1e-6)
