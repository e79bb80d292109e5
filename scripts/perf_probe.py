#!/usr/bin/env python
"""Relay-aware perf probe for the x4 FeMaSR generator.

Usage: timeout 500 python scripts/perf_probe.py TILE [BATCH] [--fused] [--iters N]

Honest-measurement methodology per CLAUDE.md: distinct inputs per dispatch
(the relay serves identical dispatches from a cache), synchronization by
fetching a scalar reduction to the host, pipelined dispatch so relay
round-trip latency overlaps with compute. Run under `timeout` — a wedged
relay or stalled remote compile must not block the session.
"""
import argparse
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('tile', type=int)
    ap.add_argument('batch', type=int, nargs='?', default=1)
    ap.add_argument('--fused', action='store_true')
    ap.add_argument('--s2d', action='store_true')
    ap.add_argument('--ws2d', action='store_true',
                    help='Pallas ws2d decoder tail (round-5)')
    ap.add_argument('--ws2d-levels', type=int, default=1,
                    help='last N decoder levels in ws2d (with --ws2d)')
    ap.add_argument('--ws2d-enc-up', action='store_true',
                    help='encoder last up block in ws2d too (needs '
                         '--ws2d-levels 2)')
    ap.add_argument('--int8', action='store_true',
                    help='w8a8 int8 decoder tail')
    ap.add_argument('--int8-levels', type=int, default=1,
                    help='last N decoder levels quantized (with --int8)')
    ap.add_argument('--int8-enc-up', action='store_true',
                    help='also quantize the LQ-encoder up blocks '
                         '(index-safe; post-quantizer skips only)')
    ap.add_argument('--int8-swin', action='store_true',
                    help='w8a8 swin qkv/proj/mlp linears (largest segment; '
                         'not index-safe)')
    ap.add_argument('--int8-mlp', action='store_true',
                    help='per-token int8 CHAIN for the swin MLPs only '
                         '(round-4 formulation; int8 crosses HBM between '
                         'fc1/fc2, zero standalone scale passes)')
    ap.add_argument('--iters', type=int, default=8)
    ap.add_argument('--compile-only', action='store_true')
    args = ap.parse_args()

    import jax
    cache_dir = os.path.expanduser('~/.cache/femasr_tpu/jax_cache')
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
    import jax.numpy as jnp

    from femasr_tpu.models import FeMaSRNet

    model = FeMaSRNet(codebook_params=[[32, 1024, 512]], LQ_stage=True,
                      scale_factor=4, norm_type='gn', act_type='silu',
                      fused_upsample=args.fused, s2d_tail=args.s2d,
                      ws2d_tail=args.ws2d, ws2d_levels=args.ws2d_levels,
                      ws2d_enc_up=args.ws2d_enc_up,
                      int8_tail=args.int8, int8_levels=args.int8_levels,
                      int8_enc_up=args.int8_enc_up,
                      int8_swin=args.int8_swin,
                      int8_mlp=args.int8_mlp,
                      dtype=jnp.bfloat16)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, args.tile, args.tile, 3), jnp.bfloat16))['params']

    @jax.jit
    def forward(params, x):
        out, _, _, _ = model.apply({'params': params}, x)
        return jnp.sum(out.astype(jnp.float32))

    shape = (args.batch, args.tile, args.tile, 3)
    t0 = time.perf_counter()
    compiled = forward.lower(params, jnp.zeros(shape, jnp.bfloat16)).compile()
    print(f'compile: {time.perf_counter() - t0:.1f}s', flush=True)
    cost = compiled.cost_analysis()
    if cost and 'flops' in cost:
        print(f'flops: {float(cost["flops"]) / 1e12:.3f} TFLOP', flush=True)
    if cost and 'bytes accessed' in cost:
        # TPU-optimized HLO traffic: decides MXU- vs HBM-bound (819 GB/s)
        b = float(cost['bytes accessed'])
        print(f'bytes accessed: {b / 1e9:.2f} GB -> HBM roofline '
              f'{b / 819e9 * 1e3:.1f} ms', flush=True)
    if args.compile_only:
        return

    # wall-clock salt: the relay serves IDENTICAL dispatches from a value
    # cache (CLAUDE.md), so fixed keys would let a re-run (and the warmup
    # vs timed xs[0] pair) time cache hits instead of execution
    salt = int(time.time() * 1e3) % 100003
    xs = [jax.random.uniform(jax.random.fold_in(jax.random.PRNGKey(salt), i),
                             shape, jnp.bfloat16)
          for i in range(args.iters + 1)]
    print(f'warmup: {float(forward(params, xs[-1])):.2f}', flush=True)
    xs = xs[:-1]
    t0 = time.perf_counter()
    results = [forward(params, x) for x in xs]
    _ = [float(r) for r in results]
    dt = (time.perf_counter() - t0) / len(xs)
    mps = args.batch * args.tile * args.tile / 1e6 / dt
    eff = (float(cost['flops']) / dt / 1e12) if cost and 'flops' in cost else 0
    print(f'tile={args.tile} batch={args.batch} fused={args.fused} '
          f's2d={args.s2d} ws2d={args.ws2d} int8={args.int8}: '
          f'{dt * 1e3:.1f} ms/iter -> {mps:.3f} MP/s, {eff:.1f} TFLOP/s eff',
          flush=True)


if __name__ == '__main__':
    main()
