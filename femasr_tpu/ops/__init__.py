from .layers import (ActLayer, CombineQuantBlock, GroupNorm, InstanceNorm,
                     NormLayer, ResBlock, conv2d, resize_bilinear,
                     resize_nearest, upsample_nearest)
from .quantize import (VectorQuantizer, gram_loss, nearest_code_indices,
                       vector_quantize)
from .swin import (RSTB, BasicLayer, Mlp, SwinLayers, SwinTransformerBlock,
                   WindowAttention, window_partition, window_reverse)

__all__ = [
    'ActLayer', 'CombineQuantBlock', 'GroupNorm', 'InstanceNorm', 'NormLayer',
    'ResBlock', 'conv2d', 'resize_bilinear', 'resize_nearest',
    'upsample_nearest',
    'VectorQuantizer', 'gram_loss', 'nearest_code_indices', 'vector_quantize',
    'RSTB', 'BasicLayer', 'Mlp', 'SwinLayers', 'SwinTransformerBlock',
    'WindowAttention', 'window_partition', 'window_reverse',
]
