#!/usr/bin/env python
"""Decoder-tail conv layout A/B: NHWC (shipped) vs NCHW — compile-only.

Round-5 finding (bench_evidence/copy_attrib_512_full_r5.txt): the 512px
serving program's wall-clock equals its PHYSICAL-byte roofline, and the
biggest physical waste is XLA's NHWC conv staging layout
[H,1,8,W/8,C]{..:T(8,128)(2,1)} — the second-minor staging dim is 8
sublanes where bf16 (2,1) packing needs 16 (2.0x on every conv), and the
C=64 tail additionally half-fills the 128-lane tile (4.0x total,
14.56 GB waste in decoder_group_2 alone). Both s2d formulations lose on
materialized pad/slice copies (FORMULATIONS.md).

This probe asks whether an NCHW tail dodges the staging tax: with C in
sublanes (64/16 = 4 clean bf16 tiles) and W in lanes (2048 | 128), the
activation tensors pad to ~0 waste. It compiles a standalone replica of
decoder_group_2 + out_conv at the 512px-serving geometry
(input (1,1024,1024,128) -> upsample -> conv3(64) -> ResBlock(64) x2 ->
conv3(3)) in both layouts and prints cost_analysis bytes + the
hlo_bytes padding-tax report for each. Compile-only: safe on a flapping
relay; co-runnable with pytest.

Reference anchor: the tail this replicates is
/root/reference/basicsr/archs/femasr_arch.py:195-211 (DecoderBlock) as
instantiated at i = max_depth-1; ours femasr_tpu/models/femasr_arch.py
DecoderBlock / ops/layers.py ResBlock.
"""
import argparse
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from hlo_bytes import analyze  # noqa: E402  (scripts/ sibling import)

sys.path.insert(0, os.path.join(HERE, 'scripts'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--h', type=int, default=1024,
                    help='input H=W (dec1 output at 512px serving: 1024)')
    ap.add_argument('--cin', type=int, default=128)
    ap.add_argument('--cout', type=int, default=64)
    ap.add_argument('--variants', default='nhwc,nchw')
    ap.add_argument('--top', type=int, default=6)
    ap.add_argument('--wall', action='store_true',
                    help='wall-clock each variant (chained lax.map, '
                         'varied inputs, host-fetch sync) instead of '
                         'printing the full byte report')
    ap.add_argument('--chain', type=int, default=4)
    ap.add_argument('--dispatches', type=int, default=3)
    args = ap.parse_args()

    import jax
    cache_dir = os.path.expanduser('~/.cache/femasr_tpu/jax_cache')
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
    import jax.numpy as jnp
    import numpy as np

    h, ci, co = args.h, args.cin, args.cout
    rng = np.random.RandomState(0)

    def mk(*shape):
        return jnp.asarray(rng.randn(*shape) * 0.05, jnp.bfloat16)

    # params once, shared by both variants (HWIO)
    params = {
        'up': mk(3, 3, ci, co), 'up_b': mk(co),
        'c1a': mk(3, 3, co, co), 'c1a_b': mk(co),
        'c1b': mk(3, 3, co, co), 'c1b_b': mk(co),
        'c2a': mk(3, 3, co, co), 'c2a_b': mk(co),
        'c2b': mk(3, 3, co, co), 'c2b_b': mk(co),
        'gn': {k: jnp.asarray(rng.randn(co), jnp.float32)
               for k in ('s1a', 'b1a', 's1b', 'b1b',
                         's2a', 'b2a', 's2b', 'b2b')},
        'out': mk(3, 3, co, 3), 'out_b': mk(3),
    }

    def gn_nhwc(x, scale, bias, groups=32, eps=1e-6):
        b, hh, ww, c = x.shape
        xf = x.astype(jnp.float32).reshape(b, hh, ww, groups, c // groups)
        mu = xf.mean(axis=(1, 2, 4), keepdims=True)
        var = ((xf - mu) ** 2).mean(axis=(1, 2, 4), keepdims=True)
        xf = (xf - mu) * jax.lax.rsqrt(var + eps)
        xf = xf.reshape(b, hh, ww, c)
        return (xf * scale + bias).astype(x.dtype)

    def gn_nchw(x, scale, bias, groups=32, eps=1e-6):
        b, c, hh, ww = x.shape
        xf = x.astype(jnp.float32).reshape(b, groups, c // groups, hh, ww)
        mu = xf.mean(axis=(2, 3, 4), keepdims=True)
        var = ((xf - mu) ** 2).mean(axis=(2, 3, 4), keepdims=True)
        xf = (xf - mu) * jax.lax.rsqrt(var + eps)
        xf = xf.reshape(b, c, hh, ww)
        return (xf * scale[None, :, None, None]
                + bias[None, :, None, None]).astype(x.dtype)

    def conv_nhwc(x, k, b):
        y = jax.lax.conv_general_dilated(
            x, k.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        return y + b.astype(y.dtype)

    def conv_nchw(x, k, b):
        y = jax.lax.conv_general_dilated(
            x, k.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=('NCHW', 'HWIO', 'NCHW'))
        return y + b.astype(y.dtype)[None, :, None, None]

    def tail_nhwc(p, x):
        g = p['gn']
        x = jnp.repeat(jnp.repeat(x, 2, 1), 2, 2)          # nearest 2x
        x = conv_nhwc(x, p['up'], p['up_b'])
        for c1, c2, sa, ba, sb, bb in (('c1a', 'c1b', 's1a', 'b1a',
                                        's1b', 'b1b'),
                                       ('c2a', 'c2b', 's2a', 'b2a',
                                        's2b', 'b2b')):
            r = gn_nhwc(x, g[sa], g[ba])
            r = jax.nn.silu(r)
            r = conv_nhwc(r, p[c1], p[c1 + '_b'])
            r = gn_nhwc(r, g[sb], g[bb])
            r = jax.nn.silu(r)
            r = conv_nhwc(r, p[c2], p[c2 + '_b'])
            x = x + r
        return jnp.sum(conv_nhwc(x, p['out'], p['out_b'])
                       .astype(jnp.float32))

    def tail_nchw(p, x):
        g = p['gn']
        x = jnp.transpose(x, (0, 3, 1, 2))                 # boundary in
        x = jnp.repeat(jnp.repeat(x, 2, 2), 2, 3)
        x = conv_nchw(x, p['up'], p['up_b'])
        for c1, c2, sa, ba, sb, bb in (('c1a', 'c1b', 's1a', 'b1a',
                                        's1b', 'b1b'),
                                       ('c2a', 'c2b', 's2a', 'b2a',
                                        's2b', 'b2b')):
            r = gn_nchw(x, g[sa], g[ba])
            r = jax.nn.silu(r)
            r = conv_nchw(r, p[c1], p[c1 + '_b'])
            r = gn_nchw(r, g[sb], g[bb])
            r = jax.nn.silu(r)
            r = conv_nchw(r, p[c2], p[c2 + '_b'])
            x = x + r
        return jnp.sum(conv_nchw(x, p['out'], p['out_b'])
                       .astype(jnp.float32))

    def gn_ws2d(x, scale, bias, groups=32, eps=1e-6):
        b, hh, wh_, c2_ = x.shape
        c = c2_ // 2
        xf = x.astype(jnp.float32)
        m1 = xf.mean(axis=(1, 2))
        m2 = jnp.square(xf).mean(axis=(1, 2))
        mean = m1.reshape(b, 2, groups, c // groups).mean(axis=(1, 3))
        mean2 = m2.reshape(b, 2, groups, c // groups).mean(axis=(1, 3))
        var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
        inv = jax.lax.rsqrt(var + eps)
        mc = jnp.tile(jnp.repeat(mean, c // groups, 1), (1, 2))
        ic = jnp.tile(jnp.repeat(inv, c // groups, 1), (1, 2))
        mul = (ic[:, None, None, :] * jnp.tile(scale, 2)).astype(x.dtype)
        sub = mc[:, None, None, :].astype(x.dtype)
        return (x - sub) * mul + jnp.tile(bias, 2).astype(x.dtype)

    def tail_ws2d(p, x):
        from femasr_tpu.ops.layers import upconv3_ws2d
        from femasr_tpu.ops.pallas.ws2d_conv import conv3_ws2d
        g = p['gn']
        x = upconv3_ws2d(x, p['up'].astype(x.dtype), p['up_b'])
        for c1, c2_, sa, ba, sb, bb in (('c1a', 'c1b', 's1a', 'b1a',
                                         's1b', 'b1b'),
                                        ('c2a', 'c2b', 's2a', 'b2a',
                                         's2b', 'b2b')):
            r = gn_ws2d(x, g[sa], g[ba])
            r = jax.nn.silu(r)
            r = conv3_ws2d(r, p[c1], p[c1 + '_b'])
            r = gn_ws2d(r, g[sb], g[bb])
            r = jax.nn.silu(r)
            r = conv3_ws2d(r, p[c2_], p[c2_ + '_b'])
            x = x + r
        return jnp.sum(conv3_ws2d(x, p['out'], p['out_b'])
                       .astype(jnp.float32))

    fns = {'nhwc': tail_nhwc, 'nchw': tail_nchw, 'ws2d': tail_ws2d}
    x = mk(1, h, h, ci)
    for v in args.variants.split(','):
        base_fn = fns[v]
        if args.wall:
            K = args.chain

            @jax.jit
            def fn(p, xs, base_fn=base_fn):
                return jnp.sum(jax.lax.map(lambda xi: base_fn(p, xi[None]),
                                           xs))
            lower_args = (params, jnp.zeros((K, h, h, ci), jnp.bfloat16))
        else:
            fn = jax.jit(base_fn)
            lower_args = (params, x)
        t0 = time.perf_counter()
        compiled = fn.lower(*lower_args).compile()
        tc = time.perf_counter() - t0
        ca = compiled.cost_analysis() or {}
        by = float(ca.get('bytes accessed', 0))
        print(f'\n##### variant {v}: compile {tc:.1f}s, cost_analysis '
              f'{by / 1e9:.2f} GB -> logical roofline '
              f'{by / 819e9 * 1e3:.1f} ms', flush=True)
        if not args.wall:
            analyze(compiled.as_text(), top_n=args.top, scope_depth=2)
            continue
        salt = int(time.time() * 1e3) % 100003
        xss = [jax.random.normal(
            jax.random.fold_in(jax.random.PRNGKey(salt), 3 * d + 2),
            (args.chain, h, h, ci), jnp.bfloat16) * 0.1
            for d in range(args.dispatches + 1)]
        float(fn(params, xss[0]))
        t0 = time.perf_counter()
        rs = [fn(params, xs) for xs in xss[1:]]
        _ = [float(r) for r in rs]
        dt = (time.perf_counter() - t0) / (args.dispatches * args.chain)
        print(f'{v}: {dt * 1e3:.2f} ms/exec (chainK={args.chain}, '
              f'roofline {by / 819e9 * 1e3:.1f} ms)', flush=True)


if __name__ == '__main__':
    main()
