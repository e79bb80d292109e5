"""VGG feature extractor (frozen) for perceptual/semantic losses.

Capability parity with /root/reference/basicsr/archs/vgg_arch.py
(VGGFeatureExtractor:54-161): named-layer feature taps on VGG11/13/16/19
(+bn variants), ImageNet input normalization, truncation at the deepest
requested layer. Weights are converted from torchvision state_dicts with
`convert_vgg_checkpoint` (no torchvision dependency at runtime).
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

VGG_CFGS = {
    'vgg11': [64, 'M', 128, 'M', 256, 256, 'M', 512, 512, 'M', 512, 512, 'M'],
    'vgg13': [64, 64, 'M', 128, 128, 'M', 256, 256, 'M', 512, 512, 'M', 512,
              512, 'M'],
    'vgg16': [64, 64, 'M', 128, 128, 'M', 256, 256, 256, 'M', 512, 512, 512,
              'M', 512, 512, 512, 'M'],
    'vgg19': [64, 64, 'M', 128, 128, 'M', 256, 256, 256, 256, 'M', 512, 512,
              512, 512, 'M', 512, 512, 512, 512, 'M'],
}

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def vgg_layer_names(vgg_type: str, use_bn: bool = False) -> List[str]:
    """Ordered layer-name list ('conv1_1', 'relu1_1', ..., 'pool5')."""
    names = []
    block, conv_idx = 1, 0
    for v in VGG_CFGS[vgg_type.replace('_bn', '')]:
        if v == 'M':
            names.append(f'pool{block}')
            block += 1
            conv_idx = 0
        else:
            conv_idx += 1
            names.append(f'conv{block}_{conv_idx}')
            if use_bn:
                names.append(f'bn{block}_{conv_idx}')
            names.append(f'relu{block}_{conv_idx}')
    return names


class _FrozenBatchNorm(nn.Module):
    """Inference-mode BatchNorm for the _bn VGG variants: running stats and
    affine live as plain (frozen) params, converted from torchvision."""
    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        scale = self.param('scale', nn.initializers.ones, (c,), jnp.float32)
        bias = self.param('bias', nn.initializers.zeros, (c,), jnp.float32)
        mean = self.param('mean', nn.initializers.zeros, (c,), jnp.float32)
        var = self.param('var', nn.initializers.ones, (c,), jnp.float32)
        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * scale + bias).astype(self.dtype)


class VGGFeatureExtractor(nn.Module):
    """Frozen VGG feature taps by named layer.

    Args mirror vgg_arch.py:54-75: layer_name_list, vgg_type, use_input_norm
    (ImageNet mean/std), range_norm ([-1,1] -> [0,1]).
    """
    layer_name_list: Sequence[str]
    vgg_type: str = 'vgg19'
    use_input_norm: bool = True
    range_norm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> Dict[str, jax.Array]:
        """x: (B, H, W, 3) RGB in [0,1] (or [-1,1] with range_norm)."""
        if self.range_norm:
            x = (x + 1.0) / 2.0
        if self.use_input_norm:
            x = (x - jnp.asarray(IMAGENET_MEAN, x.dtype)) / jnp.asarray(
                IMAGENET_STD, x.dtype)

        base = self.vgg_type.replace('_bn', '')
        use_bn = self.vgg_type.endswith('_bn')
        names = vgg_layer_names(base, use_bn=use_bn)
        wanted = set(self.layer_name_list)
        remaining = set(wanted)
        out: Dict[str, jax.Array] = {}
        for name in names:
            if name.startswith('conv'):
                features = int(VGG_CFGS[base][_conv_position(base, name)])
                x = nn.Conv(features, (3, 3), padding=((1, 1), (1, 1)),
                            dtype=self.dtype, param_dtype=jnp.float32,
                            name=name)(x)
            elif name.startswith('bn'):
                x = _FrozenBatchNorm(dtype=self.dtype, name=name)(x)
            elif name.startswith('relu'):
                x = nn.relu(x)
            elif name.startswith('pool'):
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            if name in wanted:
                out[name] = x
                remaining.discard(name)
                if not remaining:  # truncate at deepest requested layer
                    break
        # frozen by construction: gradients are cut by the caller via
        # stop_gradient on params (the trainer never optimizes this module)
        return out


def _conv_position(vgg_type: str, conv_name: str) -> int:
    """Index into VGG_CFGS[vgg_type] for a conv layer name."""
    names = vgg_layer_names(vgg_type)
    cfg_idx = -1
    for name in names:
        if name.startswith('conv') or name.startswith('pool'):
            cfg_idx += 1
        if name == conv_name:
            return cfg_idx
    raise KeyError(conv_name)


def convert_vgg_checkpoint(torch_sd, vgg_type: str = 'vgg19') -> Dict[str, Any]:
    """torchvision VGG state_dict ('features.N.weight') -> flax params.

    Handles the _bn variants (features laid out conv/bn/relu; running stats
    map onto _FrozenBatchNorm's mean/var params).
    """
    use_bn = vgg_type.endswith('_bn')
    names = vgg_layer_names(vgg_type.replace('_bn', ''), use_bn=use_bn)
    params: Dict[str, Any] = {}
    feat_idx = 0
    for name in names:
        if name.startswith('conv'):
            w = np.asarray(torch_sd[f'features.{feat_idx}.weight'])
            b = np.asarray(torch_sd[f'features.{feat_idx}.bias'])
            params[name] = {'kernel': np.ascontiguousarray(w.transpose(2, 3, 1, 0)),
                            'bias': b}
            feat_idx += 1
        elif name.startswith('bn'):
            params[name] = {
                'scale': np.asarray(torch_sd[f'features.{feat_idx}.weight']),
                'bias': np.asarray(torch_sd[f'features.{feat_idx}.bias']),
                'mean': np.asarray(
                    torch_sd[f'features.{feat_idx}.running_mean']),
                'var': np.asarray(
                    torch_sd[f'features.{feat_idx}.running_var']),
            }
            feat_idx += 1
        elif name.startswith('relu'):
            feat_idx += 1
        elif name.startswith('pool'):
            feat_idx += 1
    return params
