"""PyTorch checkpoint -> JAX pytree conversion for the FeMaSR family.

Converts the reference's released `.pth` state_dicts (FeMaSR_HRP_model_g/d,
FeMaSR_SRX2/SRX4 — /root/reference/inference_femasr.py:13-16) and any
reference-format training checkpoint into the flax parameter trees used here.

Layout transforms:
    torch Conv2d weight (O, I, kh, kw) -> flax kernel (kh, kw, I, O)
    torch Linear weight (O, I)         -> flax kernel (I, O)
    torch norm weight/bias             -> flax scale/bias
    spectral_norm weight_orig / weight_u -> kernel / 'spectral' u
"""

from __future__ import annotations

import math
from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np


def _conv_w(x: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(x.transpose(2, 3, 1, 0))


def _lin_w(x: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(x.T)


def _ident(x: np.ndarray) -> np.ndarray:
    return np.asarray(x)


def state_dict_to_numpy(state_dict: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """Detach a torch state_dict to plain numpy (torch only needed here)."""
    out = {}
    for k, v in state_dict.items():
        if hasattr(v, 'detach'):
            v = v.detach().cpu().numpy()
        # copy: torch state_dict tensors alias live buffers that in-place ops
        # (e.g. spectral-norm power iteration) would silently mutate
        out[k] = np.array(v, copy=True)
    return out


def load_torch_checkpoint(path: str, param_key: Optional[str] = 'params'
                          ) -> Dict[str, np.ndarray]:
    """Load a reference-format .pth ({'params': state_dict}) as numpy."""
    import torch
    ckpt = torch.load(path, map_location='cpu', weights_only=True)
    if param_key is not None and param_key in ckpt:
        ckpt = ckpt[param_key]
    elif 'params_ema' in ckpt:
        ckpt = ckpt['params_ema']
    return state_dict_to_numpy(ckpt)


# ---------------------------------------------------------------------------
# FeMaSRNet
# ---------------------------------------------------------------------------

def _resblock_entries(flax_prefix: Tuple[str, ...], torch_prefix: str,
                      act_type: str) -> Dict[Tuple[str, ...], Tuple[str, Any]]:
    """Map one ResBlock: flax {norm1.norm, conv1, norm2, conv2} ->
    torch Sequential conv.{0.norm,2,3.norm,5} (+ PReLU at conv.{1,4})."""
    m = {
        flax_prefix + ('norm1', 'norm', 'scale'): (f'{torch_prefix}.conv.0.norm.weight', _ident),
        flax_prefix + ('norm1', 'norm', 'bias'): (f'{torch_prefix}.conv.0.norm.bias', _ident),
        flax_prefix + ('conv1', 'kernel'): (f'{torch_prefix}.conv.2.weight', _conv_w),
        flax_prefix + ('conv1', 'bias'): (f'{torch_prefix}.conv.2.bias', _ident),
        flax_prefix + ('norm2', 'norm', 'scale'): (f'{torch_prefix}.conv.3.norm.weight', _ident),
        flax_prefix + ('norm2', 'norm', 'bias'): (f'{torch_prefix}.conv.3.norm.bias', _ident),
        flax_prefix + ('conv2', 'kernel'): (f'{torch_prefix}.conv.5.weight', _conv_w),
        flax_prefix + ('conv2', 'bias'): (f'{torch_prefix}.conv.5.bias', _ident),
    }
    if act_type == 'prelu':
        m[flax_prefix + ('act1', 'alpha')] = (f'{torch_prefix}.conv.1.func.weight', _ident)
        m[flax_prefix + ('act2', 'alpha')] = (f'{torch_prefix}.conv.4.func.weight', _ident)
    return m


def _conv_entries(flax_prefix: Tuple[str, ...], torch_prefix: str
                  ) -> Dict[Tuple[str, ...], Tuple[str, Any]]:
    return {
        flax_prefix + ('kernel',): (f'{torch_prefix}.weight', _conv_w),
        flax_prefix + ('bias',): (f'{torch_prefix}.bias', _ident),
    }


def _swin_block_entries(flax_prefix: Tuple[str, ...], torch_prefix: str
                        ) -> Dict[Tuple[str, ...], Tuple[str, Any]]:
    m: Dict[Tuple[str, ...], Tuple[str, Any]] = {}
    m[flax_prefix + ('norm1', 'scale')] = (f'{torch_prefix}.norm1.weight', _ident)
    m[flax_prefix + ('norm1', 'bias')] = (f'{torch_prefix}.norm1.bias', _ident)
    m[flax_prefix + ('norm2', 'scale')] = (f'{torch_prefix}.norm2.weight', _ident)
    m[flax_prefix + ('norm2', 'bias')] = (f'{torch_prefix}.norm2.bias', _ident)
    m[flax_prefix + ('attn', 'relative_position_bias_table')] = (
        f'{torch_prefix}.attn.relative_position_bias_table', _ident)
    m[flax_prefix + ('attn', 'qkv', 'kernel')] = (f'{torch_prefix}.attn.qkv.weight', _lin_w)
    m[flax_prefix + ('attn', 'qkv', 'bias')] = (f'{torch_prefix}.attn.qkv.bias', _ident)
    m[flax_prefix + ('attn', 'proj', 'kernel')] = (f'{torch_prefix}.attn.proj.weight', _lin_w)
    m[flax_prefix + ('attn', 'proj', 'bias')] = (f'{torch_prefix}.attn.proj.bias', _ident)
    m[flax_prefix + ('mlp', 'fc1', 'kernel')] = (f'{torch_prefix}.mlp.fc1.weight', _lin_w)
    m[flax_prefix + ('mlp', 'fc1', 'bias')] = (f'{torch_prefix}.mlp.fc1.bias', _ident)
    m[flax_prefix + ('mlp', 'fc2', 'kernel')] = (f'{torch_prefix}.mlp.fc2.weight', _lin_w)
    m[flax_prefix + ('mlp', 'fc2', 'bias')] = (f'{torch_prefix}.mlp.fc2.bias', _ident)
    return m


def femasr_param_mapping(codebook_params, gt_resolution: int = 256,
                         LQ_stage: bool = False, scale_factor: int = 4,
                         act_type: str = 'silu', use_semantic_loss: bool = False,
                         swin_depth: int = 6
                         ) -> Dict[Tuple[str, ...], Tuple[str, Any]]:
    """Full flax-path -> (torch key, transform) mapping for FeMaSRNet."""
    eff_scale = scale_factor if LQ_stage else 1
    scales = [int(p[0]) for p in codebook_params]
    max_depth = int(math.log2(gt_resolution // scales[0]))
    encode_depth = int(math.log2(gt_resolution // eff_scale // scales[0]))

    m: Dict[Tuple[str, ...], Tuple[str, Any]] = {}
    enc = ('multiscale_encoder',)
    m.update(_conv_entries(enc + ('in_conv',), 'multiscale_encoder.in_conv'))

    idx = 0
    for _ in range(encode_depth):  # down blocks: Sequential [conv, res, res]
        fb = enc + (f'blocks_{idx}',)
        tb = f'multiscale_encoder.blocks.{idx}'
        m.update(_conv_entries(fb + ('conv',), f'{tb}.0'))
        m.update(_resblock_entries(fb + ('res1',), f'{tb}.1', act_type))
        m.update(_resblock_entries(fb + ('res2',), f'{tb}.2', act_type))
        idx += 1

    if LQ_stage:
        fb = enc + (f'blocks_{idx}',)
        tb = f'multiscale_encoder.blocks.{idx}'
        for j in range(4):  # SwinLayers: 4x RSTB
            for k in range(swin_depth):
                m.update(_swin_block_entries(
                    fb + (f'swin_blks_{j}', 'residual_group', f'blocks_{k}'),
                    f'{tb}.swin_blks.{j}.residual_group.blocks.{k}'))
            m.update(_conv_entries(fb + (f'swin_blks_{j}', 'conv'),
                                   f'{tb}.swin_blks.{j}.conv'))
        idx += 1
        for _ in range(2):  # up blocks: Sequential [Upsample, conv, res, res]
            fb = enc + (f'blocks_{idx}',)
            tb = f'multiscale_encoder.blocks.{idx}'
            m.update(_conv_entries(fb + ('conv',), f'{tb}.1'))
            m.update(_resblock_entries(fb + ('res1',), f'{tb}.2', act_type))
            m.update(_resblock_entries(fb + ('res2',), f'{tb}.3', act_type))
            idx += 1

    for i in range(max_depth):  # decoder: .block Sequential [Upsample, conv, res, res]
        fb = (f'decoder_group_{i}',)
        tb = f'decoder_group.{i}.block'
        m.update(_conv_entries(fb + ('conv',), f'{tb}.1'))
        m.update(_resblock_entries(fb + ('res1',), f'{tb}.2', act_type))
        m.update(_resblock_entries(fb + ('res2',), f'{tb}.3', act_type))

    m.update(_conv_entries(('out_conv',), 'out_conv'))

    for s in range(len(codebook_params)):
        m[(f'quantize_group_{s}', 'embedding')] = (
            f'quantize_group.{s}.embedding.weight', _ident)
        m.update(_conv_entries((f'before_quant_group_{s}',),
                               f'before_quant_group.{s}'))
        m.update(_conv_entries((f'after_quant_group_{s}', 'conv'),
                               f'after_quant_group.{s}.conv'))

    if use_semantic_loss:
        m.update(_conv_entries(('conv_semantic',), 'conv_semantic.0'))
    return m


def convert_with_mapping(torch_sd: Mapping[str, np.ndarray],
                         mapping: Dict[Tuple[str, ...], Tuple[str, Any]],
                         strict: bool = True) -> Dict[str, Any]:
    """Apply a path mapping, returning a nested flax params dict."""
    from flax.traverse_util import unflatten_dict
    flat: Dict[Tuple[str, ...], np.ndarray] = {}
    missing = []
    for flax_path, (torch_key, transform) in mapping.items():
        if torch_key not in torch_sd:
            missing.append(torch_key)
            continue
        flat[flax_path] = transform(np.asarray(torch_sd[torch_key]))
    if missing and strict:
        raise KeyError(f'{len(missing)} torch keys missing, e.g. {missing[:5]}')
    return unflatten_dict(flat)


def convert_femasr_checkpoint(torch_sd: Mapping[str, np.ndarray],
                              **arch_kwargs) -> Dict[str, Any]:
    """torch FeMaSRNet state_dict -> flax params (non-strict like reference)."""
    mapping = femasr_param_mapping(**arch_kwargs)
    return convert_with_mapping(torch_sd, mapping, strict=False)


# ---------------------------------------------------------------------------
# UNetDiscriminatorSN
# ---------------------------------------------------------------------------

def convert_discriminator_checkpoint(torch_sd: Mapping[str, np.ndarray]
                                     ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """torch UNetDiscriminatorSN state_dict -> (params, spectral) trees."""
    from flax.traverse_util import unflatten_dict
    params: Dict[Tuple[str, ...], np.ndarray] = {}
    spectral: Dict[Tuple[str, ...], np.ndarray] = {}
    for name in ['conv0', 'conv9']:
        params[(name, 'kernel')] = _conv_w(np.asarray(torch_sd[f'{name}.weight']))
        params[(name, 'bias')] = _ident(np.asarray(torch_sd[f'{name}.bias']))
    for i in range(1, 9):
        name = f'conv{i}'
        params[(name, 'kernel')] = _conv_w(
            np.asarray(torch_sd[f'{name}.weight_orig']))
        if f'{name}.weight_u' in torch_sd:
            spectral[(name, 'u')] = _ident(np.asarray(torch_sd[f'{name}.weight_u']))
        if f'{name}.weight_v' in torch_sd:
            spectral[(name, 'v')] = _ident(np.asarray(torch_sd[f'{name}.weight_v']))
    return unflatten_dict(params), unflatten_dict(spectral)


def merge_params(base: Dict[str, Any], loaded: Dict[str, Any],
                 strict: bool = False) -> Dict[str, Any]:
    """Overlay `loaded` onto a freshly-initialized `base` tree.

    Non-strict load parity (reference base_model.py:258-291): entries missing
    from `loaded` keep their init values; shape mismatches are skipped with a
    warning.
    """
    from flax.traverse_util import flatten_dict, unflatten_dict
    flat_base = flatten_dict(base)
    flat_loaded = flatten_dict(loaded)
    unused = set(flat_loaded)
    for path, val in flat_base.items():
        if path in flat_loaded:
            new = flat_loaded[path]
            if tuple(np.shape(new)) == tuple(np.shape(val)):
                flat_base[path] = np.asarray(new, dtype=np.asarray(val).dtype)
            else:
                print(f'[convert] shape mismatch at {"/".join(path)}: '
                      f'{np.shape(new)} vs {np.shape(val)} — skipped')
            unused.discard(path)
        elif strict:
            raise KeyError(f'missing param {"/".join(path)}')
    if unused:
        print(f'[convert] {len(unused)} loaded params unused, e.g. '
              f'{["/".join(p) for p in list(unused)[:3]]}')
    return unflatten_dict(flat_base)
