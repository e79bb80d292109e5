#!/usr/bin/env python
"""Standalone SwinLayers timing at (1, S, S, 256) bf16 — for A/B experiments.

Usage: timeout 400 python scripts/swin_probe.py [S] [--iters N]
"""
import argparse
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('size', type=int, default=256, nargs='?')
    ap.add_argument('--iters', type=int, default=8)
    args = ap.parse_args()

    import jax
    cache_dir = os.path.expanduser('~/.cache/femasr_tpu/jax_cache')
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
    import jax.numpy as jnp

    from femasr_tpu.ops.swin import SwinLayers

    sw = SwinLayers(dtype=jnp.bfloat16)
    shape = (1, args.size, args.size, 256)
    params = jax.jit(sw.init)(jax.random.PRNGKey(0),
                              jnp.zeros(shape, jnp.bfloat16))['params']

    @jax.jit
    def f(x):
        return jnp.sum(sw.apply({'params': params}, x).astype(jnp.float32))

    xs = [jax.random.uniform(jax.random.PRNGKey(70 + i), shape, jnp.bfloat16)
          for i in range(args.iters)]
    t0 = time.perf_counter()
    print(f'warmup: {float(f(xs[0])):.2f} '
          f'(compile+run {time.perf_counter() - t0:.1f}s)', flush=True)
    t0 = time.perf_counter()
    rs = [f(x) for x in xs]
    _ = [float(r) for r in rs]
    dt = (time.perf_counter() - t0) / len(xs)
    print(f'swin @{args.size}px 256ch: {dt * 1e3:.1f} ms/iter', flush=True)


if __name__ == '__main__':
    main()
