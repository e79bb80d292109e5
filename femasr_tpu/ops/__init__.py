from .diffjpeg import diff_round, jpeg_compress, quality_to_factor
from .layers import (ActLayer, CombineQuantBlock, GroupNorm, InstanceNorm,
                     NormLayer, ResBlock, conv2d, resize_bilinear,
                     resize_nearest, upsample_nearest)
from .quantize import (VectorQuantizer, codebook_perplexity, gram_loss,
                       nearest_code_indices, vector_quantize)
from .resize import imresize, imresize_np
from .swin import (RSTB, BasicLayer, Mlp, SwinLayers, SwinTransformerBlock,
                   WindowAttention, window_partition, window_reverse)

__all__ = [
    'ActLayer', 'CombineQuantBlock', 'GroupNorm', 'InstanceNorm', 'NormLayer',
    'ResBlock', 'conv2d', 'resize_bilinear', 'resize_nearest',
    'upsample_nearest',
    'VectorQuantizer', 'codebook_perplexity', 'gram_loss',
    'nearest_code_indices', 'vector_quantize',
    'RSTB', 'BasicLayer', 'Mlp', 'SwinLayers', 'SwinTransformerBlock',
    'WindowAttention', 'window_partition', 'window_reverse',
    'diff_round', 'jpeg_compress', 'quality_to_factor', 'imresize',
    'imresize_np',
]
