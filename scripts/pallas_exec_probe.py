#!/usr/bin/env python
"""EXECUTE each Pallas kernel on the real TPU and bank parity evidence.

Round-4 companion to pallas_compile_probe.py: the relay's AOT compiler
validated the kernels' Mosaic lowering; this probe dispatches each kernel
ONCE on the chip with salted (cache-busting) inputs and compares against
the equivalent XLA program run in the same process, appending a PASS/FAIL
record to bench_evidence/pallas_exec_r4.txt. First successful run of this
banked the first real Pallas executions of the project (NOTES_ROUND4.md):
matmul_w8a8 bitwise-identical to the XLA w8a8 path, window_attention_fused
sub-bf16-LSB vs the unfused attention math.

Each case runs in its own TERM-first time-bounded subprocess; tiny shapes
(<= a few MB) so a stall cannot wedge meaningful in-flight state. The VQ
kernel is LAST and opt-in (--kernels all) — its compile hangs at model
shapes (NOTES_ROUND4.md), tiny-shape compile is known-good.

Usage: python scripts/pallas_exec_probe.py [--kernels int8mm,wattn,int8conv]
                                           [--timeout 240]
"""

import argparse
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PY = sys.executable
EVIDENCE = os.path.join(HERE, 'bench_evidence', 'pallas_exec_r4.txt')

PRELUDE = (
    'import os, jax, jax.numpy as jnp, numpy as np\n'
    'salt = int.from_bytes(os.urandom(2), "little")  # relay value-cache buster\n'
    'kk = jax.random.PRNGKey(salt)\n'
)

CASES = {
    # fused w8a8 matmul vs the XLA w8a8 path, both on device
    'int8mm': PRELUDE + (
        'from femasr_tpu.ops.layers import dense_w8a8\n'
        'from femasr_tpu.ops.pallas.int8_dense import matmul_w8a8\n'
        'x = jax.random.normal(kk, (512, 256), jnp.float32).astype(jnp.bfloat16)\n'
        'w = jax.random.normal(jax.random.fold_in(kk, 1), (256, 512), jnp.float32)\n'
        'b = jax.random.normal(jax.random.fold_in(kk, 2), (512,), jnp.float32)\n'
        'ref = np.asarray(jax.jit(dense_w8a8)(x, w, b), np.float32)\n'
        'out = np.asarray(matmul_w8a8(x, w, b, interpret=False), np.float32)\n'
        'd = float(np.abs(ref - out).max()); mag = float(np.abs(ref).max())\n'
        'print(f"int8mm exec: max|diff|={d:.6f} mag={mag:.3f} salt={salt}")\n'
        'assert d <= 0.02 * mag, (d, mag)\n'),
    # fused w8a8 3x3 conv vs the XLA w8a8 conv (first execution ever —
    # compile PASS was banked after the alignment/VMEM fixes)
    'int8conv': PRELUDE + (
        'from femasr_tpu.ops.layers import conv3_w8a8 as cxla\n'
        'from femasr_tpu.ops.pallas.int8_dense import conv3_w8a8\n'
        'x = jax.random.normal(kk, (1, 64, 64, 128), jnp.float32).astype(jnp.bfloat16)\n'
        'w = jax.random.normal(jax.random.fold_in(kk, 1), (3, 3, 128, 128), jnp.float32)\n'
        'b = jax.random.normal(jax.random.fold_in(kk, 2), (128,), jnp.float32)\n'
        'ref = np.asarray(jax.jit(cxla)(x, w, b), np.float32)\n'
        'out = np.asarray(conv3_w8a8(x, w, b, interpret=False), np.float32)\n'
        'd = float(np.abs(ref - out).max()); mag = float(np.abs(ref).max())\n'
        'print(f"int8conv exec: max|diff|={d:.6f} mag={mag:.3f} salt={salt}")\n'
        'assert d <= 0.02 * mag, (d, mag)\n'),
    # fused window attention vs the unfused attention math, both on device
    'wattn': PRELUDE + (
        'from femasr_tpu.ops.pallas.window_attention import window_attention_fused\n'
        'nh, hd = 8, 32\n'
        'q = jax.random.normal(kk, (64, 64, 256), jnp.float32).astype(jnp.bfloat16)\n'
        'k = jax.random.normal(jax.random.fold_in(kk, 1), (64, 64, 256), jnp.float32).astype(jnp.bfloat16)\n'
        'v = jax.random.normal(jax.random.fold_in(kk, 2), (64, 64, 256), jnp.float32).astype(jnp.bfloat16)\n'
        'bias = jax.random.normal(jax.random.fold_in(kk, 3), (8, 64, 64), jnp.float32)\n'
        'def ref_attn(q, k, v, bias):\n'
        '    b_, n, c = q.shape\n'
        '    qh = q.reshape(b_, n, nh, hd).transpose(0, 2, 1, 3).astype(jnp.float32)\n'
        '    kh = k.reshape(b_, n, nh, hd).transpose(0, 2, 1, 3).astype(jnp.float32)\n'
        '    vh = v.reshape(b_, n, nh, hd).transpose(0, 2, 1, 3).astype(jnp.float32)\n'
        '    lg = jnp.einsum("bhnd,bhmd->bhnm", qh, kh) + bias[None]\n'
        '    p = jax.nn.softmax(lg, axis=-1)\n'
        '    o = jnp.einsum("bhnm,bhmd->bhnd", p.astype(q.dtype).astype(jnp.float32), vh)\n'
        '    return o.transpose(0, 2, 1, 3).reshape(b_, n, c).astype(q.dtype)\n'
        'ref = np.asarray(jax.jit(ref_attn)(q, k, v, bias), np.float32)\n'
        'f = jax.jit(lambda q, k, v, b: window_attention_fused(q, k, v, b, num_heads=nh, tw=16))\n'
        'out = np.asarray(f(q, k, v, bias), np.float32)\n'
        'd = float(np.abs(ref - out).max()); mag = float(np.abs(ref).max())\n'
        'print(f"wattn exec: max|diff|={d:.6f} mag={mag:.3f} salt={salt}")\n'
        'assert d <= 0.03 * max(mag, 1.0), (d, mag)\n'),
    # bf16 ws2d conv vs the plain NHWC conv (round-5 decoder-tail kernel)
    'ws2dconv': PRELUDE + (
        'from femasr_tpu.ops.layers import to_ws2d, from_ws2d\n'
        'from femasr_tpu.ops.pallas.ws2d_conv import conv3_ws2d\n'
        'x = jax.random.normal(kk, (1, 64, 128, 64), jnp.float32).astype(jnp.bfloat16)\n'
        'w = jax.random.normal(jax.random.fold_in(kk, 1), (3, 3, 64, 64), jnp.float32) * 0.1\n'
        'b = jax.random.normal(jax.random.fold_in(kk, 2), (64,), jnp.float32) * 0.1\n'
        'def ref_conv(x, w, b):\n'
        '    y = jax.lax.conv_general_dilated(x, w.astype(x.dtype), (1, 1),\n'
        '        ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))\n'
        '    return y + b.astype(y.dtype)\n'
        'ref = np.asarray(jax.jit(ref_conv)(x, w, b), np.float32)\n'
        'f = jax.jit(lambda x, w, b: from_ws2d(conv3_ws2d(to_ws2d(x), w, b, interpret=False)))\n'
        'out = np.asarray(f(x, w, b), np.float32)\n'
        'd = float(np.abs(ref - out).max()); mag = float(np.abs(ref).max())\n'
        'print(f"ws2dconv exec: max|diff|={d:.6f} mag={mag:.3f} salt={salt}")\n'
        'assert d <= 0.03 * max(mag, 1.0), (d, mag)\n'),
    # VQ argmin at a tiny known-compiling shape (model-shape compile hangs)
    'vq_tiny': PRELUDE + (
        'from femasr_tpu.ops.pallas.vq import vq_argmin\n'
        'z = jax.random.normal(kk, (128, 128), jnp.float32)\n'
        'cb = jax.random.normal(jax.random.fold_in(kk, 1), (128, 128), jnp.float32)\n'
        'ref = np.asarray(jax.jit(lambda z, c: jnp.argmin(\n'
        '    jnp.sum((z[:, None] - c[None]) ** 2, -1), -1).astype(jnp.int32))(z, cb))\n'
        'out = np.asarray(vq_argmin(z, cb, interpret=False))\n'
        'nd = int((ref != out).sum())\n'
        '# near-tie flips are expected: the kernel evaluates c^2-2zc via an\n'
        '# f32 MXU dot, the reference sums (z-c)^2 — ULP-different values.\n'
        '# A mismatch is only REAL if the two chosen codes distances differ\n'
        '# beyond f32 noise at these magnitudes (~1e-4).\n'
        'zz = np.asarray(z); cc = np.asarray(cb)\n'
        'd = ((zz[:, None] - cc[None]) ** 2).sum(-1)\n'
        'gap = float(np.abs(d[np.arange(128), ref] - d[np.arange(128), out]).max())\n'
        'print(f"vq_tiny exec: idx mismatches={nd}/{ref.size} '
        'max-dist-gap={gap:.2e} salt={salt}")\n'
        'assert gap <= 1e-3, (nd, gap)\n'),
}


def run_case(name, snippet, timeout_s):
    env = dict(os.environ)
    env.pop('JAX_PLATFORMS', None)   # let sitecustomize pin the TPU relay
    p = subprocess.Popen([PY, '-c', snippet + 'print("EXEC_OK")'],
                         cwd=HERE, env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
    try:
        out = p.communicate(timeout=timeout_s)[0]
        ok = p.returncode == 0 and 'EXEC_OK' in out
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
    ap.add_argument('--kernels', default='int8mm,wattn,int8conv')
    ap.add_argument('--timeout', type=float, default=240.0)
    args = ap.parse_args()
    names = (list(CASES) if args.kernels == 'all'
             else [s.strip() for s in args.kernels.split(',')])

    fails = 0
    lines = [f'== pallas_exec_probe {time.strftime("%Y-%m-%d %H:%M:%S UTC", time.gmtime())}']
    for name in names:
        if name not in CASES:
            print(f'[{name}] unknown (have: {sorted(CASES)})')
            fails += 1
            continue
        ok, out = run_case(name, CASES[name], args.timeout)
        keep = [ln for ln in out.splitlines()
                if 'exec:' in ln or 'TIMEOUT' in ln or 'Error' in ln
                or 'assert' in ln.lower()]
        line = f'[{name}] {"EXEC PASS" if ok else "EXEC FAIL"}: ' \
               + ('; '.join(keep[-2:]) if keep else out.strip()[-200:])
        print(line, flush=True)
        lines.append(line)
        if not ok:
            fails += 1
    os.makedirs(os.path.dirname(EVIDENCE), exist_ok=True)
    with open(EVIDENCE, 'a') as f:
        f.write('\n'.join(lines) + '\n')
    sys.exit(fails)


if __name__ == '__main__':
    main()
