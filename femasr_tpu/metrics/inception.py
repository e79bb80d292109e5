"""InceptionV3 (FID variant) — canonical FID backbone, NHWC flax.

Parity target: the network `/root/reference/scripts/metrics/calculate_fid.py`
intends to import (`basicsr.archs.inception`, absent from the reference —
the script is broken there). That module is the pytorch-fid port of
TF-Inception ("pt_inception-2015-12-05-6726825d.pth"): torchvision
InceptionV3 layout with the FID quirks — branch-pool average pooling uses
count_include_pad=False, and Mixed_7c's pool branch is a MAX pool.

`convert_inception_checkpoint` maps that checkpoint's state_dict (torch
NCHW conv + BatchNorm eps=1e-3) onto this module, so the canonical weights
slot in the moment they are available (this container is air-gapped; see
PARITY.md). Feature output is the 2048-dim pool3 vector used by FID.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


def _avg_pool_nopad_count(x: jax.Array, window: int = 3) -> jax.Array:
    """3x3 stride-1 avg pool with count_include_pad=False (FID quirk)."""
    pad = window // 2
    ones = jnp.ones(x.shape[1:3], x.dtype)[None, :, :, None]
    sums = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, window, window, 1), (1, 1, 1, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)])
    counts = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, window, window, 1), (1, 1, 1, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)])
    return sums / counts


def _max_pool(x: jax.Array, window: int, stride: int,
              pad: int = 0) -> jax.Array:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, window, window, 1),
        (1, stride, stride, 1), [(0, 0), (pad, pad), (pad, pad), (0, 0)])


class BasicConv2d(nn.Module):
    """Conv(bias=False) + BatchNorm(eps=1e-3, frozen stats) + ReLU."""
    features: int
    kernel: Tuple[int, int]
    stride: int = 1
    padding: Tuple[int, int] = (0, 0)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Conv(self.features, self.kernel,
                    strides=(self.stride, self.stride),
                    padding=(tuple([self.padding[0]] * 2),
                             tuple([self.padding[1]] * 2)),
                    use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name='conv')(x)
        # inference-only frozen BatchNorm: stats are checkpoint parameters
        mean = self.param('bn_mean', nn.initializers.zeros,
                          (self.features,), jnp.float32)
        var = self.param('bn_var', nn.initializers.ones,
                         (self.features,), jnp.float32)
        scale = self.param('bn_scale', nn.initializers.ones,
                           (self.features,), jnp.float32)
        bias = self.param('bn_bias', nn.initializers.zeros,
                          (self.features,), jnp.float32)
        inv = (scale * jax.lax.rsqrt(var + 1e-3)).astype(self.dtype)
        x = (x - mean.astype(self.dtype)) * inv + bias.astype(self.dtype)
        return nn.relu(x)


def _conv(feats, k, s=1, p=(0, 0), name=None, dtype=jnp.float32):
    kk = (k, k) if isinstance(k, int) else k
    return BasicConv2d(feats, kk, s, p, dtype, name=name)


class InceptionA(nn.Module):
    pool_features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b1 = _conv(64, 1, name='branch1x1', dtype=d)(x)
        b5 = _conv(48, 1, name='branch5x5_1', dtype=d)(x)
        b5 = _conv(64, 5, p=(2, 2), name='branch5x5_2', dtype=d)(b5)
        b3 = _conv(64, 1, name='branch3x3dbl_1', dtype=d)(x)
        b3 = _conv(96, 3, p=(1, 1), name='branch3x3dbl_2', dtype=d)(b3)
        b3 = _conv(96, 3, p=(1, 1), name='branch3x3dbl_3', dtype=d)(b3)
        bp = _avg_pool_nopad_count(x)
        bp = _conv(self.pool_features, 1, name='branch_pool', dtype=d)(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b3 = _conv(384, 3, s=2, name='branch3x3', dtype=d)(x)
        bd = _conv(64, 1, name='branch3x3dbl_1', dtype=d)(x)
        bd = _conv(96, 3, p=(1, 1), name='branch3x3dbl_2', dtype=d)(bd)
        bd = _conv(96, 3, s=2, name='branch3x3dbl_3', dtype=d)(bd)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        c7 = self.channels_7x7
        b1 = _conv(192, 1, name='branch1x1', dtype=d)(x)
        b7 = _conv(c7, 1, name='branch7x7_1', dtype=d)(x)
        b7 = _conv(c7, (1, 7), p=(0, 3), name='branch7x7_2', dtype=d)(b7)
        b7 = _conv(192, (7, 1), p=(3, 0), name='branch7x7_3', dtype=d)(b7)
        bd = _conv(c7, 1, name='branch7x7dbl_1', dtype=d)(x)
        bd = _conv(c7, (7, 1), p=(3, 0), name='branch7x7dbl_2', dtype=d)(bd)
        bd = _conv(c7, (1, 7), p=(0, 3), name='branch7x7dbl_3', dtype=d)(bd)
        bd = _conv(c7, (7, 1), p=(3, 0), name='branch7x7dbl_4', dtype=d)(bd)
        bd = _conv(192, (1, 7), p=(0, 3), name='branch7x7dbl_5', dtype=d)(bd)
        bp = _avg_pool_nopad_count(x)
        bp = _conv(192, 1, name='branch_pool', dtype=d)(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b3 = _conv(192, 1, name='branch3x3_1', dtype=d)(x)
        b3 = _conv(320, 3, s=2, name='branch3x3_2', dtype=d)(b3)
        b7 = _conv(192, 1, name='branch7x7x3_1', dtype=d)(x)
        b7 = _conv(192, (1, 7), p=(0, 3), name='branch7x7x3_2', dtype=d)(b7)
        b7 = _conv(192, (7, 1), p=(3, 0), name='branch7x7x3_3', dtype=d)(b7)
        b7 = _conv(192, 3, s=2, name='branch7x7x3_4', dtype=d)(b7)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    """pool_type='avg' for Mixed_7b (FIDInceptionE_1), 'max' for Mixed_7c
    (FIDInceptionE_2) — the pytorch-fid deviation from torchvision."""
    pool_type: str = 'avg'
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b1 = _conv(320, 1, name='branch1x1', dtype=d)(x)
        b3 = _conv(384, 1, name='branch3x3_1', dtype=d)(x)
        b3 = jnp.concatenate([
            _conv(384, (1, 3), p=(0, 1), name='branch3x3_2a', dtype=d)(b3),
            _conv(384, (3, 1), p=(1, 0), name='branch3x3_2b', dtype=d)(b3),
        ], axis=-1)
        bd = _conv(448, 1, name='branch3x3dbl_1', dtype=d)(x)
        bd = _conv(384, 3, p=(1, 1), name='branch3x3dbl_2', dtype=d)(bd)
        bd = jnp.concatenate([
            _conv(384, (1, 3), p=(0, 1), name='branch3x3dbl_3a', dtype=d)(bd),
            _conv(384, (3, 1), p=(1, 0), name='branch3x3dbl_3b', dtype=d)(bd),
        ], axis=-1)
        if self.pool_type == 'max':
            bp = _max_pool(x, 3, 1, pad=1)
        else:
            bp = _avg_pool_nopad_count(x)
        bp = _conv(192, 1, name='branch_pool', dtype=d)(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3FID(nn.Module):
    """pool3 (2048-d) feature extractor.

    Input: (B, H, W, 3) RGB in [0, 1]; resized to 299 and mapped to [-1, 1]
    inside (`resize_input`/`normalize_input` follow pytorch-fid defaults).
    """
    resize_input: bool = True
    normalize_input: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        d = self.dtype
        if self.resize_input and x.shape[1:3] != (299, 299):
            # pytorch-fid uses F.interpolate(mode='bilinear',
            # align_corners=False) with NO antialias filter; FID is
            # sensitive to the resize kernel (clean-fid), so match it.
            x = jax.image.resize(x, (x.shape[0], 299, 299, x.shape[3]),
                                 method='bilinear', antialias=False)
        if self.normalize_input:
            x = 2.0 * x - 1.0
        x = x.astype(d)
        x = _conv(32, 3, s=2, name='Conv2d_1a_3x3', dtype=d)(x)
        x = _conv(32, 3, name='Conv2d_2a_3x3', dtype=d)(x)
        x = _conv(64, 3, p=(1, 1), name='Conv2d_2b_3x3', dtype=d)(x)
        x = _max_pool(x, 3, 2)
        x = _conv(80, 1, name='Conv2d_3b_1x1', dtype=d)(x)
        x = _conv(192, 3, name='Conv2d_4a_3x3', dtype=d)(x)
        x = _max_pool(x, 3, 2)
        x = InceptionA(32, d, name='Mixed_5b')(x)
        x = InceptionA(64, d, name='Mixed_5c')(x)
        x = InceptionA(64, d, name='Mixed_5d')(x)
        x = InceptionB(d, name='Mixed_6a')(x)
        x = InceptionC(128, d, name='Mixed_6b')(x)
        x = InceptionC(160, d, name='Mixed_6c')(x)
        x = InceptionC(160, d, name='Mixed_6d')(x)
        x = InceptionC(192, d, name='Mixed_6e')(x)
        x = InceptionD(d, name='Mixed_7a')(x)
        x = InceptionE('avg', d, name='Mixed_7b')(x)
        x = InceptionE('max', d, name='Mixed_7c')(x)
        return jnp.mean(x, axis=(1, 2)).astype(jnp.float32)  # pool3 (B, 2048)


def _basic_conv_entries(torch_prefix: str) -> Dict[str, str]:
    return {
        'conv/kernel': f'{torch_prefix}.conv.weight',
        'bn_scale': f'{torch_prefix}.bn.weight',
        'bn_bias': f'{torch_prefix}.bn.bias',
        'bn_mean': f'{torch_prefix}.bn.running_mean',
        'bn_var': f'{torch_prefix}.bn.running_var',
    }


_BLOCK_BRANCHES = {
    'A': ['branch1x1', 'branch5x5_1', 'branch5x5_2', 'branch3x3dbl_1',
          'branch3x3dbl_2', 'branch3x3dbl_3', 'branch_pool'],
    'B': ['branch3x3', 'branch3x3dbl_1', 'branch3x3dbl_2', 'branch3x3dbl_3'],
    'C': ['branch1x1', 'branch7x7_1', 'branch7x7_2', 'branch7x7_3',
          'branch7x7dbl_1', 'branch7x7dbl_2', 'branch7x7dbl_3',
          'branch7x7dbl_4', 'branch7x7dbl_5', 'branch_pool'],
    'D': ['branch3x3_1', 'branch3x3_2', 'branch7x7x3_1', 'branch7x7x3_2',
          'branch7x7x3_3', 'branch7x7x3_4'],
    'E': ['branch1x1', 'branch3x3_1', 'branch3x3_2a', 'branch3x3_2b',
          'branch3x3dbl_1', 'branch3x3dbl_2', 'branch3x3dbl_3a',
          'branch3x3dbl_3b', 'branch_pool'],
}

_LAYOUT = [('Conv2d_1a_3x3', None), ('Conv2d_2a_3x3', None),
           ('Conv2d_2b_3x3', None), ('Conv2d_3b_1x1', None),
           ('Conv2d_4a_3x3', None),
           ('Mixed_5b', 'A'), ('Mixed_5c', 'A'), ('Mixed_5d', 'A'),
           ('Mixed_6a', 'B'),
           ('Mixed_6b', 'C'), ('Mixed_6c', 'C'), ('Mixed_6d', 'C'),
           ('Mixed_6e', 'C'),
           ('Mixed_7a', 'D'), ('Mixed_7b', 'E'), ('Mixed_7c', 'E')]


def inception_param_mapping() -> Dict[str, str]:
    """flax param path ('/'-joined) -> torch state_dict key."""
    mapping: Dict[str, str] = {}
    for name, kind in _LAYOUT:
        if kind is None:
            for fk, tk in _basic_conv_entries(name).items():
                mapping[f'{name}/{fk}'] = tk
        else:
            for branch in _BLOCK_BRANCHES[kind]:
                for fk, tk in _basic_conv_entries(f'{name}.{branch}').items():
                    mapping[f'{name}/{branch}/{fk}'] = tk
    return mapping


def convert_inception_checkpoint(
        torch_sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """pt_inception / torchvision inception_v3 state_dict -> flax params.

    Accepts both bare keys ('Conv2d_1a_3x3.conv.weight') and the 'blocks.'-
    nested naming some exports use. Raises on any missing key.
    """
    norm = {}
    for k, v in torch_sd.items():
        k = k.split('inception.', 1)[-1]
        norm[k] = np.asarray(v)

    params: Dict[str, Any] = {}
    for flax_path, torch_key in inception_param_mapping().items():
        if torch_key not in norm:
            raise KeyError(f'inception checkpoint missing {torch_key}')
        val = norm[torch_key]
        if flax_path.endswith('conv/kernel'):
            val = val.transpose(2, 3, 1, 0)  # OIHW -> HWIO
        node = params
        parts = flax_path.split('/')
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(val, jnp.float32)
    return params


def inception_feature_fn(params, dtype=jnp.float32):
    """FID `feature_fn` (see fid.extract_features) over the canonical net."""
    model = InceptionV3FID(dtype=dtype)

    @jax.jit
    def fn(batch):
        return model.apply({'params': params}, jnp.asarray(batch))

    return fn


def expected_torch_keys() -> Sequence[str]:
    return sorted(inception_param_mapping().values())
