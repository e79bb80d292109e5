#!/usr/bin/env python
"""AOT-compile every Pallas kernel against the REAL TPU toolchain.

Round-4 discovery (NOTES_ROUND4.md): the axon relay's AOT compiler now
processes `tpu_custom_call` programs and returns Mosaic diagnostics in
seconds — e.g. it rejected the int8 conv kernel's unaligned HBM->VMEM
window copy ("slice shape along dimension 2 must be aligned to tiling
(128)"), which the trace-level `lowers-to-Mosaic` tests cannot see.
That turns the relay into a compile checker: this probe runs
`jit(fn).lower(...).compile()` for each kernel at model shapes, each in
its own TERM-first, time-bounded subprocess, and prints PASS/FAIL plus
the first Mosaic diagnostic line.

Compile-only — nothing is dispatched, so a hang cannot wedge in-flight
device state (the round-2/3 stall mode). Exit code = number of failures.

Usage:
  python scripts/pallas_compile_probe.py [--kernels vq,wattn,...]
                                         [--timeout 120]
"""

import argparse
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PY = sys.executable

PRELUDE = 'import jax, jax.numpy as jnp\n'

# name -> python snippet that lowers + AOT-compiles at model shapes
CASES = {
    # serving codebook search: 1024 tokens x C=512 vs K=1024 codes
    # (femasr_arch.py:35-38 replacement)
    'vq': PRELUDE + (
        'from femasr_tpu.ops.pallas.vq import vq_argmin\n'
        'jax.jit(vq_argmin).lower('
        'jnp.zeros((1024, 512), jnp.float32),'
        'jnp.zeros((1024, 512), jnp.float32)).compile()\n'),
    # swin window attention at the 512px-tile shape: 1024 windows of
    # 8x8 tokens, C=256, 8 heads (network_swinir.py:114-145 replacement)
    'wattn': PRELUDE + (
        'from femasr_tpu.ops.pallas.window_attention import '
        'window_attention_fused\n'
        'from functools import partial\n'
        'f = partial(window_attention_fused, num_heads=8, tw=16)\n'
        'jax.jit(f).lower('
        'jnp.zeros((1024, 64, 256), jnp.bfloat16),'
        'jnp.zeros((1024, 64, 256), jnp.bfloat16),'
        'jnp.zeros((1024, 64, 256), jnp.bfloat16),'
        'jnp.zeros((8, 64, 64), jnp.float32)).compile()\n'),
    # fused w8a8 dense at the swin qkv shape (all three int8 linears
    # share this program family)
    'int8mm': PRELUDE + (
        'from femasr_tpu.ops.pallas.int8_dense import matmul_w8a8\n'
        'jax.jit(lambda x, k, b: matmul_w8a8(x, k, b)).lower('
        'jnp.zeros((4096, 256), jnp.bfloat16),'
        'jnp.zeros((256, 768), jnp.float32),'
        'jnp.zeros((768,), jnp.float32)).compile()\n'),
    # w8a8 dense with fused gelu epilogue (swin MLP)
    'int8mm_gelu': PRELUDE + (
        'from femasr_tpu.ops.pallas.int8_dense import matmul_w8a8\n'
        "jax.jit(lambda x, k: matmul_w8a8(x, k, act='gelu')).lower("
        'jnp.zeros((4096, 256), jnp.bfloat16),'
        'jnp.zeros((256, 512), jnp.float32)).compile()\n'),
    # fused w8a8 3x3 conv, decoder-tail shape (C=64 -> lane-padded)
    'int8conv64': PRELUDE + (
        'from femasr_tpu.ops.pallas.int8_dense import conv3_w8a8\n'
        "jax.jit(lambda x, k, b: conv3_w8a8(x, k, b, act='silu')).lower("
        'jnp.zeros((1, 2048, 2048, 64), jnp.bfloat16),'
        'jnp.zeros((3, 3, 64, 64), jnp.float32),'
        'jnp.zeros((64,), jnp.float32)).compile()\n'),
    # fused w8a8 3x3 conv at the compute-bound mid-decoder shape
    'int8conv256': PRELUDE + (
        'from femasr_tpu.ops.pallas.int8_dense import conv3_w8a8\n'
        "jax.jit(lambda x, k, b: conv3_w8a8(x, k, b, act='silu')).lower("
        'jnp.zeros((1, 512, 512, 256), jnp.bfloat16),'
        'jnp.zeros((3, 3, 256, 256), jnp.float32),'
        'jnp.zeros((256,), jnp.float32)).compile()\n'),
    # per-token int8 CHAIN links at the 512px serving shape (65536 tokens):
    # fc1 with int8-out epilogue + fused gelu, fc2 consuming int8
    'int8mmq_fc1': PRELUDE + (
        'from femasr_tpu.ops.pallas.int8_dense import matmul_w8a8_q\n'
        "f = lambda xq, sx, k, b: matmul_w8a8_q(xq, sx, k, b, act='gelu', "
        'out_int8=True)\n'
        'jax.jit(f).lower('
        'jnp.zeros((65536, 256), jnp.int8),'
        'jnp.zeros((65536, 1), jnp.float32),'
        'jnp.zeros((256, 1024), jnp.float32),'
        'jnp.zeros((1024,), jnp.float32)).compile()\n'),
    'int8mmq_fc2': PRELUDE + (
        'from femasr_tpu.ops.pallas.int8_dense import matmul_w8a8_q\n'
        'jax.jit(lambda xq, sx, k, b: matmul_w8a8_q(xq, sx, k, b)).lower('
        'jnp.zeros((65536, 1024), jnp.int8),'
        'jnp.zeros((65536, 1), jnp.float32),'
        'jnp.zeros((1024, 256), jnp.float32),'
        'jnp.zeros((256,), jnp.float32)).compile()\n'),
    # fc1 fallback at a small token tile: fc1's row-max epilogue over 1024
    # lanes + (tm, 1) scale output shares a shape signature with the VQ
    # kernel's Mosaic-crashing 1024-lane reduction (NOTES_ROUND4.md) —
    # if int8mmq_fc1 (tm=256) fails, this bisects the tile axis
    'int8mmq_fc1_tm64': PRELUDE + (
        'from femasr_tpu.ops.pallas.int8_dense import matmul_w8a8_q\n'
        "f = lambda xq, sx, k, b: matmul_w8a8_q(xq, sx, k, b, act='gelu', "
        'out_int8=True, tm=64)\n'
        'jax.jit(f).lower('
        'jnp.zeros((65536, 256), jnp.int8),'
        'jnp.zeros((65536, 1), jnp.float32),'
        'jnp.zeros((256, 1024), jnp.float32),'
        'jnp.zeros((1024,), jnp.float32)).compile()\n'),
    # bf16 ws2d conv at the decoder-tail shape (2048px HR as 2048x1024x128
    # ws2d — full 128-lane tiles, ops/pallas/ws2d_conv.py round-5)
    'ws2dconv': PRELUDE + (
        'from femasr_tpu.ops.pallas.ws2d_conv import conv3_ws2d\n'
        'jax.jit(lambda x, k, b: conv3_ws2d(x, k, b)).lower('
        'jnp.zeros((1, 2048, 1024, 128), jnp.bfloat16),'
        'jnp.zeros((3, 3, 64, 64), jnp.float32),'
        'jnp.zeros((64,), jnp.float32)).compile()\n'),
    # ws2d out_conv (O=3 -> lane-padded output)
    'ws2dout': PRELUDE + (
        'from femasr_tpu.ops.pallas.ws2d_conv import conv3_ws2d\n'
        'jax.jit(lambda x, k, b: conv3_ws2d(x, k, b)).lower('
        'jnp.zeros((1, 2048, 1024, 128), jnp.bfloat16),'
        'jnp.zeros((3, 3, 64, 3), jnp.float32),'
        'jnp.zeros((3,), jnp.float32)).compile()\n'),
    # masked-edge 6-dot form (constant lane masks + summed disjoint edge
    # blocks — no lane concat; 1.33x HR MACs vs the 9-dot's 2x)
    'ws2dconv_d6': PRELUDE + (
        'import os; os.environ["FEMASR_WS2D_DOTS"] = "6"\n'
        'from femasr_tpu.ops.pallas.ws2d_conv import conv3_ws2d\n'
        'jax.jit(lambda x, k, b: conv3_ws2d(x, k, b)).lower('
        'jnp.zeros((1, 2048, 1024, 128), jnp.bfloat16),'
        'jnp.zeros((3, 3, 64, 64), jnp.float32),'
        'jnp.zeros((64,), jnp.float32)).compile()\n'),
    # fused GroupNorm-affine + silu prologue (per-channel vectors applied
    # in VMEM with iota-masked halo re-zeroing)
    'ws2dconv_pre': PRELUDE + (
        'from femasr_tpu.ops.pallas.ws2d_conv import conv3_ws2d\n'
        'f = lambda x, k, b, a, bb: conv3_ws2d(x, k, b, pre_scale=a, '
        "pre_bias=bb, pre_act='silu')\n"
        'jax.jit(f).lower('
        'jnp.zeros((1, 2048, 1024, 128), jnp.bfloat16),'
        'jnp.zeros((3, 3, 64, 64), jnp.float32),'
        'jnp.zeros((64,), jnp.float32),'
        'jnp.zeros((128,), jnp.float32),'
        'jnp.zeros((128,), jnp.float32)).compile()\n'),
    # 9-dot fallback (insurance if the 6-dot form's 64-lane edge slices
    # upset Mosaic)
    'ws2dconv_d9': PRELUDE + (
        'import os; os.environ["FEMASR_WS2D_DOTS"] = "9"\n'
        'from femasr_tpu.ops.pallas.ws2d_conv import conv3_ws2d\n'
        'jax.jit(lambda x, k, b: conv3_ws2d(x, k, b)).lower('
        'jnp.zeros((1, 2048, 1024, 128), jnp.bfloat16),'
        'jnp.zeros((3, 3, 64, 64), jnp.float32),'
        'jnp.zeros((64,), jnp.float32)).compile()\n'),
    # ws2d conv at a reduced row-strip (bisect insurance if the th
    # VMEM-budget choice fails on the real Mosaic limit)
    'ws2dconv_th4': PRELUDE + (
        'import os; os.environ["FEMASR_WS2D_TH"] = "4"\n'
        'from femasr_tpu.ops.pallas.ws2d_conv import conv3_ws2d\n'
        'jax.jit(lambda x, k, b: conv3_ws2d(x, k, b)).lower('
        'jnp.zeros((1, 2048, 1024, 128), jnp.bfloat16),'
        'jnp.zeros((3, 3, 64, 64), jnp.float32),'
        'jnp.zeros((64,), jnp.float32)).compile()\n'),
}


# VQ compile-hang bisect (NOTES_ROUND4.md): (1024,512)x(1024,512) hangs
# the Mosaic compile, (128,128)x(128,128) passes. One axis varies per case.
for _n, _c, _k in [(1024, 512, 128), (1024, 128, 1024), (128, 512, 1024),
                   (1024, 512, 256), (256, 512, 1024), (1024, 256, 1024),
                   (512, 512, 512)]:
    CASES[f'vq_n{_n}c{_c}k{_k}'] = PRELUDE + (
        'from femasr_tpu.ops.pallas.vq import vq_argmin\n'
        'jax.jit(vq_argmin).lower('
        f'jnp.zeros(({_n}, {_c}), jnp.float32),'
        f'jnp.zeros(({_k}, {_c}), jnp.float32)).compile()\n')


# mitigation configs at the FULL model shape: smaller token tiles and/or
# the multi-pass codebook-chunk fallback (max_codes_vmem < K) keep each
# kernel instance at known-compiling sizes with zero new kernel code.
for _tag, _tn, _mcv in [('tn512', 512, 2048), ('tn256', 256, 2048),
                        ('mcv512', 1024, 512), ('mcv256', 1024, 256),
                        ('tn512mcv512', 512, 512)]:
    CASES[f'vq_model_{_tag}'] = PRELUDE + (
        'from femasr_tpu.ops.pallas.vq import vq_argmin\n'
        'from functools import partial\n'
        f'f = partial(vq_argmin, tn={_tn}, max_codes_vmem={_mcv})\n'
        'jax.jit(f).lower('
        'jnp.zeros((16384, 512), jnp.float32),'
        'jnp.zeros((1024, 512), jnp.float32)).compile()\n')


def run_case(name: str, snippet: str, timeout_s: float) -> tuple:
    env = dict(os.environ)
    env.pop('JAX_PLATFORMS', None)   # let sitecustomize pin the TPU relay
    p = subprocess.Popen([PY, '-c', snippet + 'print("COMPILE_OK")'],
                         cwd=HERE, env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
    try:
        out = p.communicate(timeout=timeout_s)[0]
        ok = p.returncode == 0 and 'COMPILE_OK' in out
    except subprocess.TimeoutExpired:
        p.terminate()
        try:
            out = p.communicate(timeout=20)[0]
        except subprocess.TimeoutExpired:
            p.kill()
            out = p.communicate()[0]
        out = (out or '') + f'\n<<TIMEOUT {timeout_s}s>>'
        ok = False
    return ok, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--kernels', default=','.join(CASES))
    ap.add_argument('--timeout', type=float, default=120.0)
    args = ap.parse_args()

    fails = 0
    for name in args.kernels.split(','):
        name = name.strip()
        if name not in CASES:
            print(f'[{name}] unknown kernel (have: {sorted(CASES)})')
            fails += 1
            continue
        ok, out = run_case(name, CASES[name], args.timeout)
        if ok:
            print(f'[{name}] COMPILE PASS')
        else:
            fails += 1
            # surface the first Mosaic/XLA diagnostic line
            diag = [ln for ln in out.splitlines()
                    if 'Mosaic' in ln or 'INVALID_ARGUMENT' in ln
                    or 'RESOURCE_EXHAUSTED' in ln or 'TIMEOUT' in ln
                    or 'Error' in ln]
            print(f'[{name}] COMPILE FAIL: '
                  + (diag[0].strip() if diag else out.strip()[-300:]))
            tail = '\n'.join(out.splitlines()[-15:])
            print('  --- tail ---\n  ' + tail.replace('\n', '\n  '))
    sys.exit(fails)


if __name__ == '__main__':
    main()
