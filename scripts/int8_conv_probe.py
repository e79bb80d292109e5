#!/usr/bin/env python
"""int8-vs-bf16 conv timing at FeMaSR decoder shapes.

Decides whether an int8 quantized-serving path is worth building: the
decoder's C=64 convs sit at XLA's ~50-60 TF/s bf16 shape ceiling
(NOTES_ROUND2.md); v5e int8 MXU peak is 2x bf16. Chains several convs per
jit call to amortize the ~30 ms relay dispatch floor (CLAUDE.md).
Run under `timeout 560` max — never chain multiple invocations past the
Bash tool's 600 s ceiling.
"""
import argparse
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--hw', type=int, default=1024,
                    help='feature map side (decoder level 2 at 512px is 2048;'
                         ' use 1024 to keep compile cheap)')
    ap.add_argument('--ch', type=int, default=64)
    ap.add_argument('--chain', type=int, default=8,
                    help='convs chained inside one jit')
    ap.add_argument('--iters', type=int, default=6)
    args = ap.parse_args()

    import jax
    cache_dir = os.path.expanduser('~/.cache/femasr_tpu/jax_cache')
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
    import jax.numpy as jnp
    import numpy as np

    hw, ch, chain = args.hw, args.ch, args.chain
    dn = ('NHWC', 'HWIO', 'NHWC')
    flops = 2 * hw * hw * ch * ch * 9 * chain

    def bench(fn, xs, label):
        try:
            float(jnp.sum(fn(xs[0]).astype(jnp.float32)))  # warmup+sync
            t0 = time.perf_counter()
            rs = [fn(x) for x in xs]
            _ = [float(jnp.sum(r.astype(jnp.float32))) for r in rs]
            dt = (time.perf_counter() - t0) / len(xs)
            print(f'{label}: {dt * 1e3:.1f} ms/chain '
                  f'-> {flops / dt / 1e12:.1f} TF/s', flush=True)
        except Exception as e:
            print(f'{label}: FAILED {type(e).__name__}: {e}', flush=True)

    rng = np.random.default_rng(0)
    k_bf16 = jnp.asarray(rng.normal(size=(3, 3, ch, ch)) * 0.05, jnp.bfloat16)
    k_i8 = jnp.asarray(rng.integers(-127, 128, (3, 3, ch, ch)), jnp.int8)

    @jax.jit
    def conv_bf16(x):
        for _ in range(chain):
            x = jax.lax.conv_general_dilated(
                x, k_bf16, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn)
            x = jnp.tanh(x)  # keep magnitudes bounded between convs
        return x

    @jax.jit
    def conv_i8(x):
        # w8a8 with int32 accumulation; requantize to int8 between convs
        for _ in range(chain):
            acc = jax.lax.conv_general_dilated(
                x, k_i8, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn,
                preferred_element_type=jnp.int32)
            x = jnp.clip(acc >> 7, -127, 127).astype(jnp.int8)
        return x

    xs16 = [jax.random.uniform(jax.random.PRNGKey(i), (1, hw, hw, ch),
                               jnp.bfloat16) for i in range(args.iters)]
    xs8 = [jax.random.randint(jax.random.PRNGKey(i), (1, hw, hw, ch),
                              -127, 128, jnp.int8) for i in range(args.iters)]

    bench(conv_bf16, xs16, f'bf16 conv3x3 {hw}px C{ch} x{chain}')
    bench(conv_i8, xs8, f'int8 conv3x3 {hw}px C{ch} x{chain}')


if __name__ == '__main__':
    main()
