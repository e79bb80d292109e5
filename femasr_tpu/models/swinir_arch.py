"""SwinIR: full standalone SR model (second model family).

Capability parity with /root/reference/basicsr/archs/network_swinir.py
(SwinIR:618-850): shallow conv -> RSTB stack (+ optional absolute position
embedding, final LayerNorm) -> residual conv -> reconstruction head
('pixelshuffle' | 'pixelshuffledirect' | 'nearest+conv' | '' denoise),
RGB-mean shift, img_range scaling, reflect padding to window multiples.

NHWC / TPU-native: pixel-shuffle is a reshape-transpose (free under XLA);
token<->image round-trips are no-ops.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.layers import (conv2d, pixel_shuffle, pixel_unshuffle,
                          upsample_nearest)
from ..ops.swin import RSTB, LayerNormTPU
from ..utils.registry import ARCH_REGISTRY

RGB_MEAN = (0.4488, 0.4371, 0.4040)


class UpsampleShuffle(nn.Module):
    """conv -> PixelShuffle, repeated for 2^n (or once for x3)
    (network_swinir.py:572-591)."""
    scale: int
    num_feat: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if (self.scale & (self.scale - 1)) == 0:
            for i in range(int(math.log2(self.scale))):
                x = conv2d(4 * self.num_feat, 3, 1, 1, dtype=self.dtype,
                           name=f'conv_{i}')(x)
                x = pixel_shuffle(x, 2)
        elif self.scale == 3:
            x = conv2d(9 * self.num_feat, 3, 1, 1, dtype=self.dtype,
                       name='conv_0')(x)
            x = pixel_shuffle(x, 3)
        else:
            raise ValueError(f'scale {self.scale} is not supported. '
                             'Supported scales: 2^n and 3.')
        return x


@ARCH_REGISTRY.register()
class SwinIR(nn.Module):
    img_size: int = 64
    patch_size: int = 1
    in_chans: int = 3
    embed_dim: int = 96
    depths: Sequence[int] = (6, 6, 6, 6)
    num_heads: Sequence[int] = (6, 6, 6, 6)
    window_size: int = 7
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    ape: bool = False
    patch_norm: bool = True
    use_checkpoint: bool = False
    upscale: int = 2
    img_range: float = 1.0
    upsampler: str = ''
    resi_connection: str = '1conv'
    attn_layout: str = 'spatial'
    dtype: Any = jnp.float32

    def _features(self, x: jax.Array) -> jax.Array:
        """patch_embed(+norm) -> RSTBs -> norm (network_swinir.py:791-803)."""
        b, h, w, c = x.shape
        if self.patch_norm:
            x = LayerNormTPU(epsilon=1e-5, dtype=self.dtype,
                             name='patch_embed_norm')(x)
        if self.ape:
            ape = self.param('absolute_pos_embed',
                             nn.initializers.truncated_normal(0.02),
                             (1, self.img_size * self.img_size,
                              self.embed_dim), jnp.float32)
            x = x + ape.reshape(1, self.img_size, self.img_size,
                                self.embed_dim).astype(x.dtype)
        for i, depth in enumerate(self.depths):
            x = RSTB(dim=self.embed_dim,
                     input_resolution=(self.img_size, self.img_size),
                     depth=depth, num_heads=self.num_heads[i],
                     window_size=self.window_size, mlp_ratio=self.mlp_ratio,
                     qkv_bias=self.qkv_bias, qk_scale=self.qk_scale,
                     use_checkpoint=self.use_checkpoint,
                     attn_layout=self.attn_layout, dtype=self.dtype,
                     name=f'layers_{i}')(x)
        return LayerNormTPU(epsilon=1e-5, dtype=self.dtype, name='norm')(x)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h_in, w_in = x.shape[1:3]
        ws = self.window_size
        pad_h = (ws - h_in % ws) % ws
        pad_w = (ws - w_in % ws) % ws
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
                        mode='reflect')

        if self.in_chans == 3:
            mean = jnp.asarray(RGB_MEAN, x.dtype)
        else:
            mean = jnp.zeros((1,), x.dtype)
        x = (x - mean) * self.img_range

        lrelu = lambda v: nn.leaky_relu(v, negative_slope=0.2)  # noqa: E731
        num_feat = 64

        def conv_after_body(feat):
            if self.resi_connection == '1conv':
                return conv2d(self.embed_dim, 3, 1, 1, dtype=self.dtype,
                              name='conv_after_body')(feat)
            feat = lrelu(conv2d(self.embed_dim // 4, 3, 1, 1,
                                dtype=self.dtype, name='cab_0')(feat))
            feat = lrelu(conv2d(self.embed_dim // 4, 1, 1, 0,
                                dtype=self.dtype, name='cab_1')(feat))
            return conv2d(self.embed_dim, 3, 1, 1, dtype=self.dtype,
                          name='cab_2')(feat)

        if self.upsampler == 'pixelshuffle':
            feat = conv2d(self.embed_dim, 3, 1, 1, dtype=self.dtype,
                          name='conv_first')(x)
            feat = conv_after_body(self._features(feat)) + feat
            feat = nn.leaky_relu(conv2d(num_feat, 3, 1, 1, dtype=self.dtype,
                                        name='conv_before_upsample')(feat),
                                 negative_slope=0.01)
            feat = UpsampleShuffle(self.upscale, num_feat, dtype=self.dtype,
                                   name='upsample')(feat)
            out = conv2d(self.in_chans, 3, 1, 1, dtype=self.dtype,
                         name='conv_last')(feat)
        elif self.upsampler == 'pixelshuffledirect':
            feat = conv2d(self.embed_dim, 3, 1, 1, dtype=self.dtype,
                          name='conv_first')(x)
            feat = conv_after_body(self._features(feat)) + feat
            feat = conv2d(self.upscale ** 2 * self.in_chans, 3, 1, 1,
                          dtype=self.dtype, name='upsample_conv')(feat)
            out = pixel_shuffle(feat, self.upscale)
        elif self.upsampler == 'nearest+conv':
            assert self.upscale == 4, 'only support x4 now.'
            feat = conv2d(self.embed_dim, 3, 1, 1, dtype=self.dtype,
                          name='conv_first')(x)
            feat = conv_after_body(self._features(feat)) + feat
            feat = nn.leaky_relu(conv2d(num_feat, 3, 1, 1, dtype=self.dtype,
                                        name='conv_before_upsample')(feat),
                                 negative_slope=0.01)
            feat = lrelu(conv2d(num_feat, 3, 1, 1, dtype=self.dtype,
                                name='conv_up1')(upsample_nearest(feat, 2)))
            feat = lrelu(conv2d(num_feat, 3, 1, 1, dtype=self.dtype,
                                name='conv_up2')(upsample_nearest(feat, 2)))
            out = conv2d(self.in_chans, 3, 1, 1, dtype=self.dtype,
                         name='conv_last')(
                lrelu(conv2d(num_feat, 3, 1, 1, dtype=self.dtype,
                             name='conv_hr')(feat)))
        else:  # denoising / JPEG artifact removal
            feat = conv2d(self.embed_dim, 3, 1, 1, dtype=self.dtype,
                          name='conv_first')(x)
            res = conv_after_body(self._features(feat)) + feat
            out = x + conv2d(self.in_chans, 3, 1, 1, dtype=self.dtype,
                             name='conv_last')(res)

        out = out / self.img_range + mean
        return out[:, :h_in * self.upscale, :w_in * self.upscale]


def convert_swinir_checkpoint(torch_sd, depths=(6, 6, 6, 6),
                              resi_connection: str = '1conv',
                              upsampler: str = '') -> dict:
    """torch SwinIR state_dict -> flax params."""
    from .convert import (_conv_entries, _ident, _swin_block_entries)

    m = {}
    m.update(_conv_entries(('conv_first',), 'conv_first'))
    if 'patch_embed.norm.weight' in torch_sd:
        m[('patch_embed_norm', 'scale')] = ('patch_embed.norm.weight', _ident)
        m[('patch_embed_norm', 'bias')] = ('patch_embed.norm.bias', _ident)
    if 'absolute_pos_embed' in torch_sd:
        m[('absolute_pos_embed',)] = ('absolute_pos_embed', _ident)
    for i, depth in enumerate(depths):
        for k in range(depth):
            m.update(_swin_block_entries(
                (f'layers_{i}', 'residual_group', f'blocks_{k}'),
                f'layers.{i}.residual_group.blocks.{k}'))
        m.update(_conv_entries((f'layers_{i}', 'conv'), f'layers.{i}.conv'))
    m[('norm', 'scale')] = ('norm.weight', _ident)
    m[('norm', 'bias')] = ('norm.bias', _ident)
    if resi_connection == '1conv':
        m.update(_conv_entries(('conv_after_body',), 'conv_after_body'))
    if upsampler == 'pixelshuffle':
        m.update(_conv_entries(('conv_before_upsample',),
                               'conv_before_upsample.0'))
        # torch Upsample Sequential: [conv, PixelShuffle] per 2x stage
        i = 0
        while f'upsample.{2 * i}.weight' in torch_sd:
            m.update(_conv_entries(('upsample', f'conv_{i}'),
                                   f'upsample.{2 * i}'))
            i += 1
        m.update(_conv_entries(('conv_last',), 'conv_last'))
    elif upsampler == 'pixelshuffledirect':
        m.update(_conv_entries(('upsample_conv',), 'upsample.0'))
    elif upsampler == 'nearest+conv':
        m.update(_conv_entries(('conv_before_upsample',),
                               'conv_before_upsample.0'))
        for name in ['conv_up1', 'conv_up2', 'conv_hr', 'conv_last']:
            m.update(_conv_entries((name,), name))
    else:
        m.update(_conv_entries(('conv_last',), 'conv_last'))

    from .convert import convert_with_mapping
    return convert_with_mapping(torch_sd, m, strict=False)
