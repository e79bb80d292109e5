"""FeMaSRNet: VQGAN encoder/decoder with multi-scale codebook quantization.

Capability parity with /root/reference/basicsr/archs/femasr_arch.py
(FeMaSRNet:214-479, MultiScaleEncoder:135-192, DecoderBlock:195-211,
SwinLayers:114-132), re-designed TPU-first:

- NHWC layout end-to-end; nearest upsampling by broadcast; static shapes
  under jit (arbitrary-size inference handled by the batched-tile path in
  models/inference.py instead of per-image dynamic padding).
- The VGG semantic branch takes the frozen-VGG feature map as an *input*
  (computed once by the trainer) instead of embedding the frozen VGG inside
  the generator like the reference (femasr_arch.py:303-309) — this keeps the
  generator pytree clean for sharding/optimizer masking.
- Quirk preserved for checkpoint parity: `in_conv` is kernel 4, stride 1,
  padding 1, which shrinks H and W by 1 (femasr_arch.py:150).
"""

from __future__ import annotations

import math
import os
from typing import Any, List, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.layers import (ActLayer, CombineQuantBlock, Conv3Int8,
                          GroupNormS2D, GroupNormWs2D, GroupNormWs2DAffine,
                          NormLayer, ResBlock,
                          UpConv3, conv2d, conv3_s2d, from_ws2d,
                          pixel_shuffle_phase_major, to_ws2d, upconv3_s2d,
                          upconv3_ws2d, upconv3_ws2d2)
from ..ops.pallas.ws2d_conv import conv3_ws2d
from ..ops.quantize import VectorQuantizer
from ..ops.swin import SwinLayers
from ..utils.registry import ARCH_REGISTRY

Dtype = Any

# resolution -> channel width (femasr_arch.py:244-252)
CHANNEL_QUERY_DICT = {8: 256, 16: 256, 32: 256, 64: 256, 128: 128, 256: 64,
                      512: 32}


class EncoderDownBlock(nn.Module):
    """[Conv s2, ResBlock, ResBlock] (femasr_arch.py:158-162)."""
    out_ch: int
    norm_type: str = 'gn'
    act_type: str = 'silu'
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv2d(self.out_ch, 3, 2, 1, dtype=self.dtype, name='conv')(x)
        x = ResBlock(self.out_ch, self.out_ch, self.norm_type, self.act_type,
                     self.dtype, name='res1')(x, train)
        x = ResBlock(self.out_ch, self.out_ch, self.norm_type, self.act_type,
                     self.dtype, name='res2')(x, train)
        return x


class EncoderUpBlock(nn.Module):
    """[Upsample x2 nearest, Conv3, ResBlock, ResBlock] (femasr_arch.py:171-177).

    fused_upsample=True runs the exact fused low-res formulation
    (ops/layers.py fused_upsample2x_conv3) — 2.25x fewer conv FLOPs; kept
    opt-in because its compile hangs this harness's remote TPU compiler.

    int8=True runs all three convs in w8a8 (serving-only). Index-SAFE: in
    the LQ stage these up-block outputs are only the post-quantizer skip
    residuals (encode_and_decode `out + enc_feats[i]`); the quantizer
    consumes the SWIN output, which stays float.
    """
    out_ch: int
    norm_type: str = 'gn'
    act_type: str = 'silu'
    fused_upsample: bool = False
    int8: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = UpConv3(self.out_ch, fused=self.fused_upsample, int8=self.int8,
                    dtype=self.dtype, name='conv')(x)
        if self.int8:
            x = ResBlockInt8(self.out_ch, self.norm_type, self.act_type,
                             self.dtype, name='res1')(x, train)
            x = ResBlockInt8(self.out_ch, self.norm_type, self.act_type,
                             self.dtype, name='res2')(x, train)
            return x
        x = ResBlock(self.out_ch, self.out_ch, self.norm_type, self.act_type,
                     self.dtype, name='res1')(x, train)
        x = ResBlock(self.out_ch, self.out_ch, self.norm_type, self.act_type,
                     self.dtype, name='res2')(x, train)
        return x


class DecoderBlock(nn.Module):
    """Upsample(x2 nearest) -> Conv3 -> ResBlock x2 (femasr_arch.py:195-211).

    fused_upsample=True computes the exact fused low-res formulation
    (2.25x fewer conv FLOPs, no pre-conv HR activation in HBM); opt-in —
    see EncoderUpBlock note.
    """
    out_ch: int
    norm_type: str = 'gn'
    act_type: str = 'silu'
    fused_upsample: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = UpConv3(self.out_ch, fused=self.fused_upsample, dtype=self.dtype,
                    name='conv')(x)
        x = ResBlock(self.out_ch, self.out_ch, self.norm_type, self.act_type,
                     self.dtype, name='res1')(x, train)
        x = ResBlock(self.out_ch, self.out_ch, self.norm_type, self.act_type,
                     self.dtype, name='res2')(x, train)
        return x


class ResBlockInt8(nn.Module):
    """ResBlock with w8a8 int8 convs (norm/act stay in the float dtype).

    Param tree identical to ResBlock — checkpoint-interchangeable;
    serving-only (v5e int8 MXU path, 2x bf16 peak on the C=64 tail).
    """
    channel: int
    norm_type: str = 'gn'
    act_type: str = 'silu'
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.channel
        res = NormLayer(c, self.norm_type, self.dtype, name='norm1')(x, train)
        res = ActLayer(c, self.act_type, self.dtype, name='act1')(res)
        res = Conv3Int8(c, dtype=self.dtype, name='conv1')(res)
        res = NormLayer(c, self.norm_type, self.dtype, name='norm2')(res,
                                                                     train)
        res = ActLayer(c, self.act_type, self.dtype, name='act2')(res)
        res = Conv3Int8(c, dtype=self.dtype, name='conv2')(res)
        return res + x


class DecoderBlockInt8(nn.Module):
    """DecoderBlock with all three convs in w8a8 int8; param tree identical
    to DecoderBlock (serving-only, opt-in via FeMaSRNet(int8_tail=True))."""
    out_ch: int
    norm_type: str = 'gn'
    act_type: str = 'silu'
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = UpConv3(self.out_ch, int8=True, dtype=self.dtype, name='conv')(x)
        x = ResBlockInt8(self.out_ch, self.norm_type, self.act_type,
                         self.dtype, name='res1')(x, train)
        x = ResBlockInt8(self.out_ch, self.norm_type, self.act_type,
                         self.dtype, name='res2')(x, train)
        return x


class NormLayerS2D(nn.Module):
    """NormLayer in the S2D domain (gn only — the release config)."""
    channels: int
    norm_type: str = 'gn'
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.norm_type.lower() == 'gn', (
            's2d decoder tail supports norm_type=gn only')
        return GroupNormS2D(num_groups=32, eps=1e-6, dtype=self.dtype,
                            name='norm')(x)


class ResBlockS2D(nn.Module):
    """ResBlock evaluated on the phase-major S2D tensor.

    Exact re-association of ResBlock (fema_utils.py:65-84) on the 2x2
    space-to-depth packing; parameter tree identical to ResBlock, so the
    two are checkpoint-interchangeable.
    """
    channel: int
    norm_type: str = 'gn'
    act_type: str = 'silu'
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.channel
        # prelu owns a (C,) alpha which cannot broadcast against the
        # (..., 4C) phase-major tensor — fail with a clear message rather
        # than an opaque broadcast error at init (mirrors NormLayerS2D's
        # gn-only assert)
        assert self.act_type.lower() in (
            'relu', 'leakyrelu', 'silu', 'gelu', 'none'), (
            f's2d decoder tail requires a phase-shape-agnostic activation, '
            f'got act_type={self.act_type!r} (prelu is unsupported)')
        res = NormLayerS2D(c, self.norm_type, self.dtype,
                           name='norm1')(x, train)
        res = ActLayer(c, self.act_type, self.dtype, name='act1')(res)
        k1 = Conv3S2D(c, dtype=self.dtype, name='conv1')
        res = k1(res)
        res = NormLayerS2D(c, self.norm_type, self.dtype,
                           name='norm2')(res, train)
        res = ActLayer(c, self.act_type, self.dtype, name='act2')(res)
        res = Conv3S2D(c, dtype=self.dtype, name='conv2')(res)
        return res + x


class Conv3S2D(nn.Module):
    """3x3 SAME HR conv on the S2D tensor; params match conv2d(features, 3)."""
    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1] // 4
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (3, 3, in_ch, self.features), jnp.float32)
        bias = self.param('bias', nn.initializers.zeros,
                          (self.features,), jnp.float32)
        return conv3_s2d(x.astype(self.dtype), kernel.astype(self.dtype),
                         bias)


class UpConv3S2D(nn.Module):
    """nearest-2x upsample + 3x3 conv emitting the S2D form; params match
    UpConv3 (kernel (3,3,I,O) + bias)."""
    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (3, 3, in_ch, self.features), jnp.float32)
        bias = self.param('bias', nn.initializers.zeros,
                          (self.features,), jnp.float32)
        return upconv3_s2d(x.astype(self.dtype), kernel.astype(self.dtype),
                           bias)


class DecoderBlockS2D(nn.Module):
    """DecoderBlock evaluated in the space-to-depth domain.

    Takes the normal (B, H, W, C_in) input; the fused upsample emits the
    (B, H, W, 4*out_ch) phase-major S2D form directly (no HR activation is
    ever materialized) and the ResBlocks stay in that domain. Param tree
    identical to DecoderBlock — checkpoint-interchangeable.
    """
    out_ch: int
    norm_type: str = 'gn'
    act_type: str = 'silu'
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = UpConv3S2D(self.out_ch, dtype=self.dtype, name='conv')(x)
        x = ResBlockS2D(self.out_ch, self.norm_type, self.act_type,
                        self.dtype, name='res1')(x, train)
        x = ResBlockS2D(self.out_ch, self.norm_type, self.act_type,
                        self.dtype, name='res2')(x, train)
        return x


class NormLayerWs2D(nn.Module):
    """NormLayer in the ws2d domain (gn only — the release config)."""
    channels: int
    norm_type: str = 'gn'
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.norm_type.lower() == 'gn', (
            'ws2d decoder tail supports norm_type=gn only')
        return GroupNormWs2D(num_groups=32, eps=1e-6, dtype=self.dtype,
                             name='norm')(x)


class NormLayerWs2DAffine(nn.Module):
    """Stats-only NormLayerWs2D: returns the folded (a, b) affine for the
    ws2d conv kernel's prologue. Params nest identically to NormLayerWs2D
    (<name>/norm/{scale,bias}) — checkpoint-interchangeable."""
    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return GroupNormWs2DAffine(num_groups=32, eps=1e-6,
                                   dtype=self.dtype, name='norm')(x)


class Conv3Ws2D(nn.Module):
    """3x3 SAME HR conv on the ws2d tensor via the Pallas kernel;
    params match conv2d(features, 3) — checkpoint-interchangeable.
    `pre` = (a, b[, act]) folds the preceding GroupNorm normalize (+ act)
    into the kernel prologue (stats computed by GroupNormWs2DAffine)."""
    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pre=None):
        in_ch = x.shape[-1] // 2
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (3, 3, in_ch, self.features), jnp.float32)
        bias = self.param('bias', nn.initializers.zeros,
                          (self.features,), jnp.float32)
        if pre is None:
            return conv3_ws2d(x.astype(self.dtype), kernel, bias)
        a, b, pact = pre
        return conv3_ws2d(x.astype(self.dtype), kernel, bias,
                          pre_scale=a, pre_bias=b, pre_act=pact)


class ResBlockWs2D(nn.Module):
    """ResBlock evaluated on the ws2d tensor (norm/act in XLA — they tile
    cleanly on the 128-lane form — convs in the Pallas ws2d kernel).
    Parameter tree identical to ResBlock; checkpoint-interchangeable."""
    channel: int
    norm_type: str = 'gn'
    act_type: str = 'silu'
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.channel
        assert self.act_type.lower() in (
            'relu', 'leakyrelu', 'silu', 'gelu', 'none'), (
            f'ws2d decoder tail requires a phase-shape-agnostic activation, '
            f'got act_type={self.act_type!r} (prelu is unsupported)')
        # fused path (release config gn+silu, lane-aligned channels):
        # GroupNorm stats in XLA, normalize+silu inside the conv kernel
        # prologue — one fewer HBM round trip per conv. Param trees
        # identical either way. FEMASR_WS2D_FUSE_GN=0 restores unfused.
        fuse = (self.norm_type.lower() == 'gn'
                and self.act_type.lower() == 'silu'
                and (2 * c) % 128 == 0
                and os.environ.get('FEMASR_WS2D_FUSE_GN') != '0')
        if fuse:
            a1, b1 = NormLayerWs2DAffine(c, self.dtype, name='norm1')(x)
            res = Conv3Ws2D(c, dtype=self.dtype, name='conv1')(
                x, pre=(a1, b1, 'silu'))
            a2, b2 = NormLayerWs2DAffine(c, self.dtype,
                                         name='norm2')(res)
            res = Conv3Ws2D(c, dtype=self.dtype, name='conv2')(
                res, pre=(a2, b2, 'silu'))
            return res + x
        res = NormLayerWs2D(c, self.norm_type, self.dtype,
                            name='norm1')(x, train)
        res = ActLayer(c, self.act_type, self.dtype, name='act1')(res)
        res = Conv3Ws2D(c, dtype=self.dtype, name='conv1')(res)
        res = NormLayerWs2D(c, self.norm_type, self.dtype,
                            name='norm2')(res, train)
        res = ActLayer(c, self.act_type, self.dtype, name='act2')(res)
        res = Conv3Ws2D(c, dtype=self.dtype, name='conv2')(res)
        return res + x


class UpConv3Ws2D(nn.Module):
    """nearest-2x upsample + 3x3 conv emitting the ws2d form directly
    (ops/layers.py upconv3_ws2d); params match UpConv3/conv2d.
    ws2d_in=True consumes a ws2d input too (level chaining — upconv3_ws2d2)."""
    features: int
    ws2d_in: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1] // (2 if self.ws2d_in else 1)
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (3, 3, in_ch, self.features), jnp.float32)
        bias = self.param('bias', nn.initializers.zeros,
                          (self.features,), jnp.float32)
        fn = upconv3_ws2d2 if self.ws2d_in else upconv3_ws2d
        return fn(x.astype(self.dtype), kernel.astype(self.dtype), bias)


class DecoderBlockWs2D(nn.Module):
    """DecoderBlock whose whole body runs in the ws2d domain.

    The fused upsample emits the ws2d form directly (no HR NHWC tensor,
    no relayout) and the two ResBlocks + out_conv stay there — the C=64
    HR tensors never materialize in the tile-padded NHWC form.
    Param tree identical to DecoderBlock — checkpoint-interchangeable.
    """
    out_ch: int
    norm_type: str = 'gn'
    act_type: str = 'silu'
    ws2d_in: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = UpConv3Ws2D(self.out_ch, ws2d_in=self.ws2d_in,
                        dtype=self.dtype, name='conv')(x)
        x = ResBlockWs2D(self.out_ch, self.norm_type, self.act_type,
                         self.dtype, name='res1')(x, train)
        x = ResBlockWs2D(self.out_ch, self.norm_type, self.act_type,
                         self.dtype, name='res2')(x, train)
        return x


class EncoderUpBlockWs2D(nn.Module):
    """EncoderUpBlock evaluated in the ws2d domain (round-5).

    Emits the ws2d form directly (fused upsample upconv3_ws2d), so the
    1024px C=128 up-level tensors never materialize in the staged NHWC
    form (the encoder's 2.0x-waste class). Output feeds the chained-ws2d
    decoder skip in-domain. Param tree identical to EncoderUpBlock.
    """
    out_ch: int
    norm_type: str = 'gn'
    act_type: str = 'silu'
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = UpConv3Ws2D(self.out_ch, dtype=self.dtype, name='conv')(x)
        x = ResBlockWs2D(self.out_ch, self.norm_type, self.act_type,
                         self.dtype, name='res1')(x, train)
        x = ResBlockWs2D(self.out_ch, self.norm_type, self.act_type,
                         self.dtype, name='res2')(x, train)
        return x


class MultiScaleEncoder(nn.Module):
    """in_conv + stride-2 down blocks (+ SwinLayers + 2 up blocks in LQ stage).

    Returns the list of all intermediate block outputs
    (femasr_arch.py:184-192).
    """
    in_channel: int
    max_depth: int
    input_res: int = 256
    norm_type: str = 'gn'
    act_type: str = 'silu'
    lq_stage: bool = True
    swin_mlp_ratio: float = 4.0
    use_checkpoint: bool = False
    fused_upsample: bool = False
    int8_enc_up: bool = False
    int8_swin: bool = False
    int8_mlp: bool = False
    attn_layout: str = 'spatial'
    # emit the LAST up block's output in ws2d form (EncoderUpBlockWs2D)
    # — only meaningful when the consumer (the chained-ws2d decoder
    # skip) expects it; see FeMaSRNet.ws2d_enc_up
    ws2d_up_last: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False,
                 stop: Optional[str] = None) -> List[jax.Array]:
        """stop: probe-only early exit ('inconv' | 'down' | 'swin1'..'swin4'
        | 'up0') — returns the outputs produced so far plus the current
        tensor, so scripts/serve_prefix_probe.py can wall-clock-attribute
        the encoder internally. Unused trailing params are ignored by
        flax apply; never set in the serving/training paths."""
        x = conv2d(CHANNEL_QUERY_DICT[self.input_res], 4, 1, 1,
                   dtype=self.dtype, name='in_conv')(x)
        if stop == 'inconv':
            return [x]

        outputs: List[jax.Array] = []
        res = self.input_res
        idx = 0
        for _ in range(self.max_depth):
            out_ch = CHANNEL_QUERY_DICT[res // 2]
            x = EncoderDownBlock(out_ch, self.norm_type, self.act_type,
                                 self.dtype, name=f'blocks_{idx}')(x, train)
            outputs.append(x)
            res //= 2
            idx += 1
        if stop == 'down':
            return outputs

        if self.lq_stage:
            swin_groups = 4
            if stop is not None and stop.startswith('swin'):
                swin_groups = int(stop[4:])
            x = SwinLayers(mlp_ratio=self.swin_mlp_ratio,
                           use_checkpoint=self.use_checkpoint,
                           attn_layout=self.attn_layout,
                           int8_linears=self.int8_swin,
                           int8_mlp=self.int8_mlp,
                           num_groups=swin_groups,
                           dtype=self.dtype,
                           name=f'blocks_{idx}')(x)
            outputs.append(x)
            idx += 1
            if stop is not None and stop.startswith('swin'):
                return outputs
            for up_i in range(2):
                out_ch = CHANNEL_QUERY_DICT[res * 2]
                if self.ws2d_up_last and up_i == 1:
                    x = EncoderUpBlockWs2D(
                        out_ch, self.norm_type, self.act_type, self.dtype,
                        name=f'blocks_{idx}')(x, train)
                else:
                    x = EncoderUpBlock(out_ch, self.norm_type,
                                       self.act_type, self.fused_upsample,
                                       self.int8_enc_up, self.dtype,
                                       name=f'blocks_{idx}')(x, train)
                outputs.append(x)
                res *= 2
                idx += 1
                if stop == f'up{up_i}':
                    return outputs

        return outputs


@ARCH_REGISTRY.register()
class FeMaSRNet(nn.Module):
    """Top-level FeMaSR generator (femasr_arch.py:214-479).

    codebook_params: [[scale, n_e, e_dim], ...] ordered low->high resolution;
    release config [[32, 1024, 512]].
    """
    codebook_params: Sequence[Sequence[int]]
    in_channel: int = 3
    gt_resolution: int = 256
    LQ_stage: bool = False
    norm_type: str = 'gn'
    act_type: str = 'silu'
    use_quantize: bool = True
    scale_factor: int = 4
    use_semantic_loss: bool = False
    use_residual: bool = True
    vq_backend: str = 'xla'
    # force f32 codebook index search in bf16 models (reference-exact
    # indices for gt-index generation / eval parity — ops/quantize.py)
    vq_index_f32: bool = False
    use_checkpoint: bool = False
    fused_upsample: bool = False
    # evaluate the last decoder level + out_conv in the 2x2 space-to-depth
    # domain (exact math, ~1.5x faster C=64 convs on the MXU); requires gn
    s2d_tail: bool = False
    # serving-only: last decoder level's ResBlocks + out_conv in the
    # width-s2d domain with Pallas convs (ops/pallas/ws2d_conv.py) —
    # kills the C=64 NHWC tile-padding waste (14.56 GB physical on the
    # 512px program, bench_evidence/copy_attrib_512_full_r5.txt);
    # requires gn; exact math (bf16 rounding order differs)
    ws2d_tail: bool = False
    # with ws2d_tail: run the last N decoder levels in ws2d (level 2
    # chains via the ws2d-input fused upsample, upconv3_ws2d2; the
    # encoder skip joins via to_ws2d — targets decoder_group_1's
    # 2.44 GB staging waste on top of dec2's)
    ws2d_levels: int = 1
    # with ws2d_levels>=2 (LQ stage): the encoder's LAST up block also
    # runs in ws2d and its skip joins the decoder in-domain — targets
    # the encoder up-level's 2.0x staging-waste class
    ws2d_enc_up: bool = False
    # serving-only: last decoder level + out_conv in w8a8 int8 (v5e int8
    # MXU = 2x bf16 peak); dynamic per-tensor activation scales, per-
    # channel weight scales, checkpoint-free (ops/layers.py conv3_w8a8)
    int8_tail: bool = False
    # >1 with int8_tail: quantize the last N decoder levels, not just the
    # final one (level C=128 also sits below bf16 MXU peak)
    int8_levels: int = 1
    # serving-only: LQ-encoder up blocks in w8a8 (index-SAFE — they feed
    # only the post-quantizer skip residuals; see EncoderUpBlock)
    int8_enc_up: bool = False
    # serving-only: swin qkv/proj/fc1/fc2 linears in w8a8 (~96% of swin
    # FLOPs, the largest serving segment). NOT index-safe: swin feeds
    # the quantizer, so near-tie codebook indices can flip — the same
    # divergence class as bf16 serving (PARITY.md); quality-gated in
    # tests/test_inference.py
    int8_swin: bool = False
    # serving-only: per-token int8 CHAIN for the swin MLPs alone
    # (fc1 -> GELU -> fc2 with int8 crossing HBM between the links and
    # zero standalone scale passes; ops/layers.py dense_w8a8_ptok /
    # ops/pallas/int8_dense.py matmul_w8a8_q). The round-4 formulation
    # that avoids the measured per-tensor byte blowup (NOTES_ROUND4.md);
    # same index-flip caveat as int8_swin (the MLP feeds the quantizer)
    int8_mlp: bool = False
    # 'spatial' | 'winmajor': window-major residual groups (partition once
    # per RSTB group; SW-MSA shifts as static row gathers). Bit-exact; see
    # ops/swin.py BasicLayer. Env override FEMASR_SWIN_LAYOUT for A/Bs.
    attn_layout: str = 'spatial'
    dtype: Dtype = jnp.float32

    @property
    def codebook_scale(self) -> List[int]:
        return [int(p[0]) for p in self.codebook_params]

    @property
    def effective_scale_factor(self) -> int:
        return self.scale_factor if self.LQ_stage else 1

    @property
    def max_depth(self) -> int:
        return int(math.log2(self.gt_resolution // self.codebook_scale[0]))

    @property
    def encode_depth(self) -> int:
        return int(math.log2(self.gt_resolution // self.effective_scale_factor
                             // self.codebook_scale[0]))

    def setup(self):
        params = [list(map(int, p)) for p in self.codebook_params]
        scales = [p[0] for p in params]
        emb_nums = [p[1] for p in params]
        emb_dims = [p[2] for p in params]

        if self.ws2d_enc_up:
            assert self.ws2d_tail and self.ws2d_levels >= 2 and \
                self.LQ_stage, (
                    'ws2d_enc_up requires LQ_stage + ws2d_tail with '
                    'ws2d_levels >= 2 (the skip consumer must be in-domain)')
        self.multiscale_encoder = MultiScaleEncoder(
            in_channel=self.in_channel,
            max_depth=self.encode_depth,
            input_res=self.gt_resolution // self.effective_scale_factor,
            norm_type=self.norm_type, act_type=self.act_type,
            lq_stage=self.LQ_stage, use_checkpoint=self.use_checkpoint,
            fused_upsample=self.fused_upsample,
            int8_enc_up=self.int8_enc_up, int8_swin=self.int8_swin,
            int8_mlp=self.int8_mlp,
            attn_layout=self.attn_layout,
            ws2d_up_last=self.ws2d_enc_up,
            dtype=self.dtype)

        assert sum((self.s2d_tail, self.int8_tail, self.ws2d_tail)) <= 1, (
            's2d_tail / ws2d_tail / int8_tail are mutually exclusive')
        decoders = []
        out_ch = None
        for i in range(self.max_depth):
            res = self.gt_resolution // 2 ** self.max_depth * 2 ** i
            out_ch = CHANNEL_QUERY_DICT[res * 2]
            if self.s2d_tail and i == self.max_depth - 1:
                decoders.append(DecoderBlockS2D(
                    out_ch, self.norm_type, self.act_type, self.dtype,
                    name=f'decoder_group_{i}'))
            elif (self.ws2d_tail
                  and i >= self.max_depth - self.ws2d_levels):
                decoders.append(DecoderBlockWs2D(
                    out_ch, self.norm_type, self.act_type,
                    ws2d_in=i > self.max_depth - self.ws2d_levels,
                    dtype=self.dtype,
                    name=f'decoder_group_{i}'))
            elif self.int8_tail and i >= self.max_depth - self.int8_levels:
                decoders.append(DecoderBlockInt8(
                    out_ch, self.norm_type, self.act_type, self.dtype,
                    name=f'decoder_group_{i}'))
            else:
                decoders.append(DecoderBlock(
                    out_ch, self.norm_type, self.act_type,
                    self.fused_upsample, self.dtype,
                    name=f'decoder_group_{i}'))
        self.decoder_group = decoders
        if self.s2d_tail:
            self.out_conv = Conv3S2D(3, dtype=self.dtype, name='out_conv')
        elif self.ws2d_tail:
            self.out_conv = Conv3Ws2D(3, dtype=self.dtype, name='out_conv')
        elif self.int8_tail:
            self.out_conv = Conv3Int8(3, dtype=self.dtype, name='out_conv')
        else:
            self.out_conv = conv2d(3, 3, 1, 1, dtype=self.dtype,
                                   name='out_conv')

        quantizers, before_quant, after_quant = [], [], []
        for scale in range(len(params)):
            quantizers.append(VectorQuantizer(
                n_e=emb_nums[scale], e_dim=emb_dims[scale],
                lq_stage=self.LQ_stage, backend=self.vq_backend,
                index_f32=self.vq_index_f32,
                dtype=self.dtype, name=f'quantize_group_{scale}'))
            scale_in_ch = CHANNEL_QUERY_DICT[scales[scale]]
            if scale == 0:
                comb_ch1, comb_ch2 = emb_dims[scale], 0
            else:
                comb_ch1, comb_ch2 = emb_dims[scale - 1], emb_dims[scale]
            before_quant.append(conv2d(emb_dims[scale], 1, 1, 0,
                                       dtype=self.dtype,
                                       name=f'before_quant_group_{scale}'))
            after_quant.append(CombineQuantBlock(
                comb_ch1, comb_ch2, scale_in_ch, dtype=self.dtype,
                name=f'after_quant_group_{scale}'))
        self.quantize_group = quantizers
        self.before_quant_group = before_quant
        self.after_quant_group = after_quant

        if self.use_semantic_loss:
            self.conv_semantic = conv2d(512, 1, 1, 0, dtype=self.dtype,
                                        name='conv_semantic')

    def encode_and_decode(self, x: jax.Array,
                          gt_indices: Optional[Sequence[jax.Array]] = None,
                          vgg_feat: Optional[jax.Array] = None,
                          train: bool = False):
        """Core forward (femasr_arch.py:311-374).

        Args:
            x: (B, H, W, 3) input in [0, 1].
            gt_indices: per-codebook-scale GT index maps (LQ-stage training).
            vgg_feat: frozen VGG relu4_4 features of the input (only used when
                use_semantic_loss; supplied by the trainer).
        Returns:
            (out_img, codebook_loss, semantic_loss, indices_list)
        """
        enc_feats = self.multiscale_encoder(jax.lax.stop_gradient(x), train)
        if self.LQ_stage:
            enc_feats = enc_feats[-3:]
        else:
            enc_feats = enc_feats[::-1]

        codebook_loss_list = []
        semantic_loss_list = []
        indices_list = []

        quant_idx = 0
        prev_dec_feat = None
        prev_quant_feat = None
        out = enc_feats[0]
        for i in range(self.max_depth):
            cur_res = self.gt_resolution // 2 ** self.max_depth * 2 ** i
            if cur_res in self.codebook_scale:
                if prev_dec_feat is not None:
                    before_quant_feat = jnp.concatenate(
                        [enc_feats[i], prev_dec_feat], axis=-1)
                else:
                    before_quant_feat = enc_feats[i]
                feat_to_quant = self.before_quant_group[quant_idx](before_quant_feat)

                gt_idx = gt_indices[quant_idx] if gt_indices is not None else None
                z_quant, codebook_loss, indices = self.quantize_group[quant_idx](
                    feat_to_quant, gt_idx)

                if self.use_semantic_loss and vgg_feat is not None:
                    semantic_z_quant = nn.relu(self.conv_semantic(z_quant))
                    semantic_loss = jnp.mean(jnp.square(
                        semantic_z_quant.astype(jnp.float32)
                        - vgg_feat.astype(jnp.float32)))
                    semantic_loss_list.append(semantic_loss)

                if not self.use_quantize:
                    z_quant = feat_to_quant

                after_quant_feat = self.after_quant_group[quant_idx](
                    z_quant, prev_quant_feat)

                codebook_loss_list.append(codebook_loss)
                indices_list.append(indices)

                quant_idx += 1
                prev_quant_feat = z_quant
                out = after_quant_feat
            else:
                if self.LQ_stage and self.use_residual:
                    if (self.ws2d_tail
                            and i > self.max_depth - self.ws2d_levels):
                        # `out` is in ws2d form (previous level was a
                        # chained ws2d block); join the skip in-domain.
                        # With ws2d_enc_up the last encoder output is
                        # ALREADY ws2d.
                        skip = enc_feats[i]
                        if not (self.ws2d_enc_up
                                and i == self.max_depth - 1):
                            skip = to_ws2d(skip)
                        out = out + skip
                    else:
                        out = out + enc_feats[i]

            out = self.decoder_group[i](out, train)
            prev_dec_feat = out

        out_img = self.out_conv(out)
        if self.s2d_tail:
            out_img = pixel_shuffle_phase_major(out_img)
        elif self.ws2d_tail:
            out_img = from_ws2d(out_img)

        codebook_loss = sum(codebook_loss_list)
        semantic_loss = (sum(semantic_loss_list) if semantic_loss_list
                         else jnp.zeros((), jnp.float32))
        return out_img, codebook_loss, semantic_loss, indices_list

    def decode_indices(self, indices: jax.Array) -> jax.Array:
        """Decode a raw code-index map to an image (femasr_arch.py:376-385)."""
        z_quant = self.quantize_group[0].get_codebook_entry(indices)
        x = self.after_quant_group[0](z_quant)
        for dec in self.decoder_group:
            x = dec(x)
        x = self.out_conv(x)
        if self.s2d_tail:
            x = pixel_shuffle_phase_major(x)
        elif self.ws2d_tail:
            x = from_ws2d(x)
        return x

    def __call__(self, x: jax.Array,
                 gt_indices: Optional[Sequence[jax.Array]] = None,
                 vgg_feat: Optional[jax.Array] = None,
                 train: bool = False):
        return self.encode_and_decode(x, gt_indices=gt_indices,
                                      vgg_feat=vgg_feat, train=train)
