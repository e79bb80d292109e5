"""Model architectures (ARCH_REGISTRY) and the YAML-driven factory.

Parity: /root/reference/basicsr/archs/__init__.py:19-25 (build_network).
"""

from copy import deepcopy

from ..utils.registry import ARCH_REGISTRY
from .discriminator_arch import SpectralConv, UNetDiscriminatorSN
from .femasr_arch import (CHANNEL_QUERY_DICT, DecoderBlock, EncoderDownBlock,
                          EncoderUpBlock, FeMaSRNet, MultiScaleEncoder)
from .swinir_arch import SwinIR, pixel_shuffle, pixel_unshuffle
from .vgg_arch import VGGFeatureExtractor, convert_vgg_checkpoint

__all__ = ['build_network', 'FeMaSRNet', 'UNetDiscriminatorSN', 'SwinIR',
           'SpectralConv', 'MultiScaleEncoder', 'DecoderBlock',
           'EncoderDownBlock', 'EncoderUpBlock', 'CHANNEL_QUERY_DICT',
           'VGGFeatureExtractor', 'convert_vgg_checkpoint', 'pixel_shuffle',
           'pixel_unshuffle']


def build_network(opt):
    """Instantiate a network module from a YAML `network_*` dict."""
    opt = deepcopy(dict(opt))
    network_type = opt.pop('type')
    # keys consumed by the trainer, not the module
    opt.pop('frozen_module_keywords', None)
    # YAML `dtype: bfloat16` -> compute-dtype mixed precision (params,
    # norm statistics and losses stay f32 by module convention)
    if isinstance(opt.get('dtype'), str):
        import jax.numpy as jnp
        opt['dtype'] = jnp.dtype(opt['dtype']).type
    net = ARCH_REGISTRY.get(network_type)(**opt)
    return net
