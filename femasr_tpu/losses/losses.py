"""Training losses (functional JAX; losses are pure functions of arrays).

Capability parity with /root/reference/basicsr/losses/losses.py:
L1/MSE/Charbonnier (:15-130), LPIPSLoss (:30-40, here backed by the native
JAX LPIPS instead of pyiqa), WeightedTVLoss (:133-159), PerceptualLoss
(:162-269), GANLoss incl. hinge (:272-374), MultiScaleGANLoss (:377-401),
r1_penalty / g_path_regularize / gradient_penalty_loss (:404-506),
GANFeatLoss (:461-506).

All losses compute in float32. Losses that need parameters (VGG/LPIPS) take
them explicitly — the trainer owns the frozen weights.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from ..utils.registry import LOSS_REGISTRY
from .loss_util import weighted_loss

_reduction_modes = ['none', 'mean', 'sum']


@weighted_loss
def l1_loss(pred, target):
    return jnp.abs(pred - target)


@weighted_loss
def mse_loss(pred, target):
    return jnp.square(pred - target)


@weighted_loss
def charbonnier_loss(pred, target, eps=1e-12):
    return jnp.sqrt(jnp.square(pred - target) + eps)


class _WeightedLossModule:
    """Common (loss_weight, reduction) wrapper."""

    def __init__(self, loss_weight: float = 1.0, reduction: str = 'mean'):
        if reduction not in _reduction_modes:
            raise ValueError(f'Unsupported reduction mode: {reduction}. '
                             f'Supported ones are: {_reduction_modes}')
        self.loss_weight = loss_weight
        self.reduction = reduction


@LOSS_REGISTRY.register()
class L1Loss(_WeightedLossModule):
    def __call__(self, pred, target, weight=None):
        return self.loss_weight * l1_loss(
            pred.astype(jnp.float32), target.astype(jnp.float32), weight,
            reduction=self.reduction)


@LOSS_REGISTRY.register()
class MSELoss(_WeightedLossModule):
    def __call__(self, pred, target, weight=None):
        return self.loss_weight * mse_loss(
            pred.astype(jnp.float32), target.astype(jnp.float32), weight,
            reduction=self.reduction)


@LOSS_REGISTRY.register()
class CharbonnierLoss(_WeightedLossModule):
    def __init__(self, loss_weight=1.0, reduction='mean', eps=1e-12):
        super().__init__(loss_weight, reduction)
        self.eps = eps

    def __call__(self, pred, target, weight=None):
        return self.loss_weight * charbonnier_loss(
            pred.astype(jnp.float32), target.astype(jnp.float32), weight,
            eps=self.eps, reduction=self.reduction)


@LOSS_REGISTRY.register()
class WeightedTVLoss:
    """L1 of x/y finite differences (losses.py:133-159). NHWC."""

    def __init__(self, loss_weight=1.0, reduction='mean'):
        if reduction not in ['mean', 'sum']:
            raise ValueError(f'Unsupported reduction mode: {reduction}. '
                             'Supported ones are: mean | sum')
        self._l1 = L1Loss(loss_weight=loss_weight, reduction=reduction)

    def __call__(self, pred, weight=None):
        y_w = weight[:, :-1, :, :] if weight is not None else None
        x_w = weight[:, :, :-1, :] if weight is not None else None
        y_diff = self._l1(pred[:, :-1, :, :], pred[:, 1:, :, :], weight=y_w)
        x_diff = self._l1(pred[:, :, :-1, :], pred[:, :, 1:, :], weight=x_w)
        return x_diff + y_diff


@LOSS_REGISTRY.register()
class LPIPSLoss:
    """LPIPS perceptual loss; returns (loss * weight, None) like the
    reference's pyiqa-backed version (losses.py:30-40).

    The LPIPS params are bound at trainer setup via `bind_params`.
    """

    def __init__(self, loss_weight: float = 1.0, params: Optional[Any] = None):
        from .lpips import LPIPS
        self.loss_weight = loss_weight
        self.model = LPIPS()
        self.params = params

    def bind_params(self, params) -> 'LPIPSLoss':
        self.params = params
        return self

    def __call__(self, x, gt):
        if self.params is None:
            raise RuntimeError(
                'LPIPSLoss has no weights bound. Convert LPIPS/VGG16 weights '
                'with femasr_tpu.losses.lpips.convert_lpips_checkpoint and '
                'pass them via bind_params / the trainer option '
                "path.pretrain_lpips.")
        dist = self.model.apply(
            {'params': jax.lax.stop_gradient(self.params)}, x, gt)
        return jnp.mean(dist) * self.loss_weight, None


@LOSS_REGISTRY.register()
class PerceptualLoss:
    """VGG-feature perceptual + optional Gram style loss (losses.py:162-269).

    NHWC. VGG params are bound at trainer setup via `bind_params`.
    """

    def __init__(self, layer_weights: Dict[str, float], vgg_type='vgg19',
                 use_input_norm=True, range_norm=False, perceptual_weight=1.0,
                 style_weight=0., criterion='l1', params: Optional[Any] = None):
        from ..models.vgg_arch import VGGFeatureExtractor
        self.layer_weights = layer_weights
        self.perceptual_weight = perceptual_weight
        self.style_weight = style_weight
        self.vgg = VGGFeatureExtractor(
            layer_name_list=list(layer_weights.keys()), vgg_type=vgg_type,
            use_input_norm=use_input_norm, range_norm=range_norm)
        self.criterion_type = criterion
        self.params = params

    def bind_params(self, params) -> 'PerceptualLoss':
        self.params = params
        return self

    def _crit(self, a, b):
        if self.criterion_type == 'l1':
            return jnp.mean(jnp.abs(a - b))
        if self.criterion_type == 'l2':
            return jnp.mean(jnp.square(a - b))
        if self.criterion_type == 'fro':
            return jnp.linalg.norm((a - b).reshape(-1))
        raise NotImplementedError(self.criterion_type)

    def __call__(self, x, gt):
        if self.params is None:
            raise RuntimeError('PerceptualLoss needs VGG params; convert with '
                               'models.vgg_arch.convert_vgg_checkpoint and '
                               'bind via bind_params.')
        params = jax.lax.stop_gradient(self.params)
        x_feats = self.vgg.apply({'params': params}, x)
        gt_feats = self.vgg.apply({'params': params},
                                  jax.lax.stop_gradient(gt))

        percep_loss = None
        if self.perceptual_weight > 0:
            percep_loss = sum(
                self._crit(x_feats[k].astype(jnp.float32),
                           gt_feats[k].astype(jnp.float32)) * w
                for k, w in self.layer_weights.items())
            percep_loss = percep_loss * self.perceptual_weight

        style_loss = None
        if self.style_weight > 0:
            style_loss = sum(
                self._crit(self._gram(x_feats[k]), self._gram(gt_feats[k])) * w
                for k, w in self.layer_weights.items())
            style_loss = style_loss * self.style_weight
        return percep_loss, style_loss

    @staticmethod
    def _gram(x):
        n, h, w, c = x.shape
        feats = x.reshape(n, h * w, c).astype(jnp.float32)
        return jnp.einsum('bnc,bnd->bcd', feats, feats) / (c * h * w)


@LOSS_REGISTRY.register()
class GANLoss:
    """vanilla / lsgan / wgan / wgan_softplus / hinge (losses.py:272-374).

    loss_weight applies to generator losses only (is_disc=False).
    """

    def __init__(self, gan_type: str, real_label_val=1.0, fake_label_val=0.0,
                 loss_weight=1.0):
        self.gan_type = gan_type
        self.real_label_val = real_label_val
        self.fake_label_val = fake_label_val
        self.loss_weight = loss_weight
        if gan_type not in ('vanilla', 'lsgan', 'wgan', 'wgan_softplus',
                            'hinge'):
            raise NotImplementedError(f'GAN type {gan_type} is not implemented.')

    def __call__(self, pred, target_is_real: bool, is_disc: bool = False):
        pred = pred.astype(jnp.float32)
        gt_val = self.real_label_val if target_is_real else self.fake_label_val

        if self.gan_type == 'hinge':
            if is_disc:
                pred = -pred if target_is_real else pred
                loss = jnp.mean(jax.nn.relu(1 + pred))
            else:
                loss = -jnp.mean(pred)
        elif self.gan_type == 'vanilla':
            labels = jnp.full_like(pred, gt_val)
            loss = jnp.mean(
                jnp.maximum(pred, 0) - pred * labels
                + jnp.log1p(jnp.exp(-jnp.abs(pred))))
        elif self.gan_type == 'lsgan':
            loss = jnp.mean(jnp.square(pred - gt_val))
        elif self.gan_type == 'wgan':
            loss = -jnp.mean(pred) if target_is_real else jnp.mean(pred)
        elif self.gan_type == 'wgan_softplus':
            loss = (jnp.mean(jax.nn.softplus(-pred)) if target_is_real
                    else jnp.mean(jax.nn.softplus(pred)))
        return loss if is_disc else loss * self.loss_weight


@LOSS_REGISTRY.register()
class MultiScaleGANLoss(GANLoss):
    """GANLoss over a list of (lists of) predictions (losses.py:377-401)."""

    def __call__(self, preds, target_is_real, is_disc=False):
        if isinstance(preds, (list, tuple)):
            total = 0.0
            for p in preds:
                if isinstance(p, (list, tuple)):
                    p = p[-1]
                total = total + super().__call__(p, target_is_real, is_disc)
            return total / len(preds)
        return super().__call__(preds, target_is_real, is_disc)


def r1_penalty(disc_fn, real_img):
    """R1 regularization: ||grad D(x)||^2 on real data (losses.py:404-421)."""
    def scalar_out(x):
        return jnp.sum(disc_fn(x))
    grad = jax.grad(scalar_out)(real_img)
    return jnp.mean(jnp.sum(jnp.square(grad.reshape(grad.shape[0], -1)),
                            axis=1))


def g_path_regularize(fake_fn, latents, mean_path_length, decay=0.01,
                      key=None):
    """StyleGAN2 path-length regularizer (losses.py:424-439)."""
    fake_img = fake_fn(latents)
    noise_scale = jnp.sqrt(fake_img.shape[1] * fake_img.shape[2]).astype(
        jnp.float32)
    noise = (jax.random.normal(key or jax.random.PRNGKey(0), fake_img.shape)
             / noise_scale)
    _, vjp = jax.vjp(fake_fn, latents)
    (grad,) = vjp(noise)
    path_lengths = jnp.sqrt(
        jnp.mean(jnp.sum(jnp.square(grad.reshape(grad.shape[0], -1)), axis=1)))
    path_mean = mean_path_length + decay * (
        jnp.mean(path_lengths) - mean_path_length)
    path_penalty = jnp.mean(jnp.square(path_lengths - path_mean))
    return path_penalty, jnp.mean(path_lengths), path_mean


def gradient_penalty_loss(disc_fn, real_data, fake_data, key,
                          weight=None):
    """WGAN-GP gradient penalty on interpolates (losses.py:442-458)."""
    alpha = jax.random.uniform(key, (real_data.shape[0], 1, 1, 1))
    interpolates = alpha * real_data + (1.0 - alpha) * fake_data

    def scalar_out(x):
        return jnp.sum(disc_fn(x))

    grad = jax.grad(scalar_out)(interpolates)
    if weight is not None:
        grad = grad * weight
    norm = jnp.sqrt(jnp.sum(jnp.square(grad.reshape(grad.shape[0], -1)),
                            axis=1))
    loss = jnp.mean(jnp.square(norm - 1.0))
    if weight is not None:
        loss = loss / jnp.mean(weight)
    return loss


@LOSS_REGISTRY.register()
class GANFeatLoss:
    """Discriminator feature-matching loss (losses.py:461-506)."""

    def __init__(self, criterion='l1', loss_weight=1.0, reduction='mean'):
        if criterion == 'l1':
            self.loss_op = L1Loss(loss_weight, reduction)
        elif criterion == 'l2':
            self.loss_op = MSELoss(loss_weight, reduction)
        elif criterion == 'charbonnier':
            self.loss_op = CharbonnierLoss(loss_weight, reduction)
        else:
            raise ValueError(f'Unsupported loss mode: {criterion}. '
                             'Supported ones are: l1|l2|charbonnier')
        self.loss_weight = loss_weight

    def __call__(self, pred_fake: Sequence, pred_real: Sequence):
        num_d = len(pred_fake)
        loss = 0.0
        for i in range(num_d):
            num_intermediate = len(pred_fake[i]) - 1
            for j in range(num_intermediate):
                unweighted = self.loss_op(
                    pred_fake[i][j], jax.lax.stop_gradient(pred_real[i][j]))
                loss = loss + unweighted / num_d
        return loss * self.loss_weight
