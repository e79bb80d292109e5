#!/usr/bin/env python
"""Minimal repro: XLA TPU picks batch-interleaved conv layouts at batch>=2.

Observed (round 3, NOTES_ROUND3.md window 6): the full FeMaSR 512px serving
program costs 1.72x the per-pixel HBM bytes at batch 2 vs batch 1 (590.2 GB
vs 2x171.6), with layout-{4,2,1,3,0} copies around every conv; the chanraw
GroupNorm fix cut it to 1.86x-per-pixel on the b8 TRAINING program, proving
the pathology is conv-level, not norm-level. Serving therefore chains
batch-1 programs (lax.map) and training microbatches at chunk=1 — batch
parallelism is forfeited.

This script is the committed minimal repro (VERDICT r3 item #5): ONE
bf16 3x3 SAME NHWC conv at the decoder-tail shape, compiled at batch 1,
batch 2, and batch-2-folded-into-height (one zero separator row between
the two images: for a 3x3 SAME conv the separator reproduces each image's
zero boundary exactly, so outputs match batch-2 after slicing — but XLA
sees batch 1 and keeps the fast layout). Compile-only: prints per-pixel
'bytes accessed' ratios and whether interleaved-layout copies appear.

Upstream issue sketch (filed-from-here text):
  title: TPU layout assignment picks batch-interleaved layouts for
         NHWC bf16 convs at batch>=2, costing ~1.7x per-pixel HBM traffic
  body:  compile the three programs below on v5e; compare
         cost_analysis()['bytes accessed'] / pixel and the scheduled HLO's
         copy layouts. b1 and folded-b2 stream at ~parity; true b2
         inserts {4,2,1,3,0} copies around the convolution and nearly
         doubles per-pixel traffic. Expected: b2 ~= b1 per pixel.

Usage: timeout 400 python scripts/xla_batch_layout_repro.py [--hw 2048]
                                                            [--c 64]
"""
import argparse
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--hw', type=int, default=2048)
    ap.add_argument('--c', type=int, default=64)
    args = ap.parse_args()

    import jax
    cache_dir = os.path.expanduser('~/.cache/femasr_tpu/jax_cache')
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
    import jax.numpy as jnp

    hw, c = args.hw, args.c
    k = jnp.zeros((3, 3, c, c), jnp.float32)

    def conv(x, k):
        return jax.lax.conv_general_dilated(
            x, k.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    def folded(x2, k):
        # (2, H, W, C) -> (1, 2H+1, W, C) with one zero separator row:
        # SAME zero-padding semantics are preserved for a 3x3 kernel, so
        # slicing the output back reproduces batch-2 exactly.
        a, b = x2[0], x2[1]
        sep = jnp.zeros((1, x2.shape[2], x2.shape[3]), x2.dtype)
        tall = jnp.concatenate([a, sep, b], axis=0)[None]
        y = conv(tall, k)
        h = x2.shape[1]
        return jnp.stack([y[0, :h], y[0, h + 1:]], axis=0)

    # Composite block: conv -> chanraw GroupNorm -> silu -> conv, the
    # model's actual tail pattern. First TPU run of the single-conv cases
    # (10:19 UTC) measured b2/b1 = only 1.11x with zero interleaved
    # copies — the 1.72x pathology needs the composite graph, not a lone
    # conv.
    from femasr_tpu.ops.layers import NormLayer, ActLayer
    import flax.linen as nn

    class Block(nn.Module):
        @nn.compact
        def __call__(self, x):
            y = conv(x, k)
            y = NormLayer(c, norm_type='gn', dtype=jnp.bfloat16)(y)
            y = ActLayer('silu', dtype=jnp.bfloat16)(y)
            return conv(y, k)

    blk = Block()
    bp = blk.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, c),
                                                   jnp.bfloat16))

    def block1(x, k):
        return blk.apply(bp, x)

    def block_folded(x2, k):
        a, b = x2[0], x2[1]
        # 8 zero separator rows: enough for two 3x3 halos + GN is
        # per-sample-independent only in batch — folding changes GN
        # stats, so this variant is LAYOUT evidence only, not exact.
        sep = jnp.zeros((8, x2.shape[2], x2.shape[3]), x2.dtype)
        tall = jnp.concatenate([a, sep, b], axis=0)[None]
        return blk.apply(bp, tall)

    results = {}
    for name, fn, shape in [
            ('b1', conv, (1, hw, hw, c)),
            ('b2', conv, (2, hw, hw, c)),
            ('b2_folded', folded, (2, hw, hw, c)),
            ('blk_b1', block1, (1, hw, hw, c)),
            ('blk_b2', block1, (2, hw, hw, c)),
            ('blk_b2_folded', block_folded, (2, hw, hw, c))]:
        x = jnp.zeros(shape, jnp.bfloat16)
        compiled = jax.jit(fn).lower(x, k).compile()
        ca = compiled.cost_analysis() or {}
        by = float(ca.get('bytes accessed', 0.0))
        pix = shape[0] * hw * hw
        txt = compiled.as_text()
        interleaved = txt.count('{4,2,1,3,0}') + txt.count('{4,3,1,2,0}')
        results[name] = by / pix
        print(f'[{name}] bytes/pixel {by / pix:.1f}  '
              f'(total {by / 1e9:.2f} GB; interleaved-layout copies: '
              f'{interleaved})', flush=True)

    r2 = results['b2'] / results['b1']
    rf = results['b2_folded'] / results['b1']
    print(f'per-pixel ratio: b2/b1 = {r2:.2f}x, folded/b1 = {rf:.2f}x')
    rb2 = results['blk_b2'] / results['blk_b1']
    rbf = results['blk_b2_folded'] / results['blk_b1']
    print(f'block per-pixel ratio: b2/b1 = {rb2:.2f}x, '
          f'folded/b1 = {rbf:.2f}x')
    # numeric check of the folding trick (CPU or TPU, tiny shape)
    import numpy as np
    xs = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 16, 16, c)).astype(np.float32)).astype(jnp.bfloat16)
    kk = jnp.asarray(np.random.default_rng(1).normal(
        size=(3, 3, c, c)).astype(np.float32) * 0.1)
    d = jnp.max(jnp.abs(conv(xs, kk).astype(jnp.float32)
                        - folded(xs, kk).astype(jnp.float32)))
    print(f'fold-exactness max|diff| = {float(d):.2e}')


if __name__ == '__main__':
    main()
