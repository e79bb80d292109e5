"""LPIPS perceptual metric/loss (VGG16 backbone), implemented natively in JAX.

Capability parity with the reference's pyiqa `lpips-vgg` usage
(/root/reference/basicsr/losses/losses.py:30-40 LPIPSLoss and
models/femasr_model.py:27-34 metric creation). Follows the published LPIPS
formulation (Zhang et al., CVPR'18): VGG16 taps at relu{1_2,2_2,3_3,4_3,5_3},
channel-unit-normalized feature differences, learned non-negative 1x1 linear
weights, spatial mean, sum over layers.

Weights are converted from the standard `lpips` package / pyiqa checkpoints
via `convert_lpips_checkpoint` (keys 'net.slice*.weight' / 'lin*.model.1.weight').
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..models.vgg_arch import VGGFeatureExtractor, convert_vgg_checkpoint

LPIPS_VGG_LAYERS = ('relu1_2', 'relu2_2', 'relu3_3', 'relu4_3', 'relu5_3')
LPIPS_VGG_CHANNELS = (64, 128, 256, 512, 512)

# LPIPS input scaling layer constants (ScalingLayer in the lpips package)
LPIPS_SHIFT = np.array([-.030, -.088, -.188], np.float32)
LPIPS_SCALE = np.array([.458, .448, .450], np.float32)


def _unit_normalize(x: jax.Array, eps: float = 1e-10) -> jax.Array:
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
    return x / (norm + eps)


class LPIPS(nn.Module):
    """LPIPS(x, y) distance for NHWC RGB images in [0, 1]."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, y: jax.Array) -> jax.Array:
        feats = VGGFeatureExtractor(
            layer_name_list=list(LPIPS_VGG_LAYERS), vgg_type='vgg16',
            use_input_norm=False, dtype=self.dtype, name='net')

        def scale(img):
            img = img * 2.0 - 1.0  # [0,1] -> [-1,1]
            return (img - jnp.asarray(LPIPS_SHIFT, img.dtype)) / jnp.asarray(
                LPIPS_SCALE, img.dtype)

        fx = feats(scale(x))
        fy = feats(scale(y))

        total = jnp.zeros((x.shape[0],), jnp.float32)
        for i, layer in enumerate(LPIPS_VGG_LAYERS):
            dx = _unit_normalize(fx[layer].astype(jnp.float32))
            dy = _unit_normalize(fy[layer].astype(jnp.float32))
            diff2 = jnp.square(dx - dy)
            lin_w = self.param(f'lin{i}',
                               nn.initializers.constant(1.0 / diff2.shape[-1]),
                               (LPIPS_VGG_CHANNELS[i],), jnp.float32)
            val = jnp.einsum('bhwc,c->bhw', diff2, lin_w)
            total = total + jnp.mean(val, axis=(1, 2))
        return total


def convert_lpips_checkpoint(lpips_sd: Dict[str, np.ndarray],
                             vgg16_sd: Dict[str, np.ndarray] | None = None
                             ) -> Dict[str, Any]:
    """Convert lpips-package state dicts into LPIPS module params.

    lpips_sd: the LPIPS head ('lin{i}.model.1.weight' (1, C, 1, 1)); may also
        contain the backbone as 'net.slice{k}.{j}.weight'.
    vgg16_sd: optional separate torchvision vgg16 state_dict.
    """
    params: Dict[str, Any] = {}
    for i in range(5):
        for key in (f'lin{i}.model.1.weight', f'lins.{i}.model.1.weight'):
            if key in lpips_sd:
                params[f'lin{i}'] = np.asarray(lpips_sd[key]).reshape(-1)
                break
        else:
            raise KeyError(f'lin{i} weight not found in LPIPS checkpoint')

    if vgg16_sd is not None:
        params['net'] = convert_vgg_checkpoint(vgg16_sd, 'vgg16')
    else:
        # backbone embedded as net.slice{1..5}.{torch_features_idx}.weight
        feat_sd = {}
        for k, v in lpips_sd.items():
            if k.startswith('net.slice'):
                idx = k.split('.', 3)[2]
                feat_sd[f'features.{idx}.{k.rsplit(".", 1)[1]}'] = v
        if feat_sd:
            params['net'] = convert_vgg_checkpoint(feat_sd, 'vgg16')
    return params
