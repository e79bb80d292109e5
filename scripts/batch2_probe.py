#!/usr/bin/env python
"""Localize the batch-2 per-pixel regression (VERDICT r2 weak #2).

512px x4 batch 2 measured 0.67 MP/s vs batch 1's 1.29 — 3.4x worse per
pixel, not capacity (7.7/16 GB HBM). This probe times each model segment
at batch 1 vs batch 2 and prints per-pixel-normalized ratios so the
regressing segment is identified in one relay window.

Usage: timeout 550 python scripts/batch2_probe.py [TILE] [--iters N]
"""
import argparse
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def bench(fn, xs):
    fn(xs[0]).block_until_ready()
    float(fn(xs[0]))  # real sync via host fetch (relay block_until_ready lies)
    t0 = time.perf_counter()
    rs = [fn(x) for x in xs]
    _ = [float(r) for r in rs]
    return (time.perf_counter() - t0) / len(xs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('tile', type=int, default=512, nargs='?')
    ap.add_argument('--iters', type=int, default=5)
    ap.add_argument('--segments', type=str,
                    default='full,encoder,swin,decoder,vq',
                    help='comma list: full,encoder,swin,decoder,declevels,vq')
    args = ap.parse_args()
    segs = set(args.segments.split(','))

    import jax
    cache_dir = os.path.expanduser('~/.cache/femasr_tpu/jax_cache')
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
    import jax.numpy as jnp

    from femasr_tpu.models import FeMaSRNet
    from femasr_tpu.models.femasr_arch import DecoderBlock
    from femasr_tpu.ops.layers import conv2d
    from femasr_tpu.ops.quantize import VectorQuantizer
    from femasr_tpu.ops.swin import SwinLayers

    t = args.tile
    key = jax.random.PRNGKey(0)

    def inputs(shape, n):
        return [jax.random.uniform(jax.random.PRNGKey(50 + i), shape,
                                   jnp.bfloat16) for i in range(n)]

    def compare(name, fn, fn_params, shape1):
        """Times jit fn(params, x) at batch 1 and 2; per-pixel ratio.

        Params are passed as ARGUMENTS (not closure constants) so the
        program matches bench.py's cache entries and compiles lean.
        """
        times = {}
        for b in (1, 2):
            shape = (b,) + shape1[1:]
            xs = inputs(shape, args.iters)
            dt = bench(lambda x: fn(fn_params, x), xs)
            times[b] = dt
            print(f'  {name} b{b}: {dt * 1e3:7.1f} ms', flush=True)
        ratio = times[2] / (2 * times[1])
        flag = '  <-- REGRESSION' if ratio > 1.3 else ''
        print(f'  {name} per-pixel b2/b1 ratio: {ratio:.2f}{flag}',
              flush=True)

    model = FeMaSRNet(codebook_params=[[32, 1024, 512]], LQ_stage=True,
                      scale_factor=4, norm_type='gn', act_type='silu',
                      dtype=jnp.bfloat16)
    params = jax.jit(model.init)(key, jnp.zeros((1, t, t, 3),
                                                jnp.bfloat16))['params']

    if 'full' in segs:
        @jax.jit
        def forward(params, x):   # identical program to bench.py's child
            out, _, _, _ = model.apply({'params': params}, x)
            return jnp.sum(out.astype(jnp.float32))
        compare('full', forward, params, (1, t, t, 3))

    if 'encoder' in segs:
        @jax.jit
        def enc(params, x):
            outs = model.apply({'params': params}, x,
                               method=lambda m, x: m.multiscale_encoder(x))
            return sum(jnp.sum(o.astype(jnp.float32)) for o in outs)
        compare('encoder', enc, params, (1, t, t, 3))

    if 'swin' in segs:
        sw = SwinLayers(dtype=jnp.bfloat16)
        sshape = (1, t // 2, t // 2, 256)
        sparams = jax.jit(sw.init)(key, jnp.zeros(sshape,
                                                  jnp.bfloat16))['params']

        @jax.jit
        def swin(params, x):
            return jnp.sum(sw.apply({'params': params},
                                    x).astype(jnp.float32))
        compare('swin', swin, sparams, sshape)

    if 'decoder' in segs or 'declevels' in segs:
        blocks = [DecoderBlock(256, 'gn', 'silu', False, jnp.bfloat16),
                  DecoderBlock(128, 'gn', 'silu', False, jnp.bfloat16),
                  DecoderBlock(64, 'gn', 'silu', False, jnp.bfloat16)]
        oc = conv2d(3, 3, 1, 1, dtype=jnp.bfloat16)
        shapes = [(1, t // 2, t // 2, 256), (1, t, t, 256),
                  (1, 2 * t, 2 * t, 128)]
        bparams = [jax.jit(b.init)(key, jnp.zeros(s, jnp.bfloat16))['params']
                   for b, s in zip(blocks, shapes)]
        ocparams = jax.jit(oc.init)(key, jnp.zeros((1, 4 * t, 4 * t, 64),
                                                   jnp.bfloat16))['params']
        if 'decoder' in segs:
            @jax.jit
            def dec(ps, x):
                for b, p in zip(blocks, ps[:-1]):
                    x = b.apply({'params': p}, x)
                x = oc.apply({'params': ps[-1]}, x)
                return jnp.sum(x.astype(jnp.float32))
            compare('decoder', dec, tuple(bparams) + (ocparams,), shapes[0])
        if 'declevels' in segs:
            for i, (blk, p, s) in enumerate(zip(blocks, bparams, shapes)):
                @jax.jit
                def one(p, x, blk=blk):
                    return jnp.sum(blk.apply({'params': p},
                                             x).astype(jnp.float32))
                compare(f'dec_level{i}', one, p, s)

    if 'vq' in segs:
        vq = VectorQuantizer(n_e=1024, e_dim=512, lq_stage=True,
                             dtype=jnp.bfloat16)
        # latent = (t * scale_factor) / 2**max_depth = t/2 for x4 @ gt256
        vshape = (1, t // 2, t // 2, 512)
        vparams = jax.jit(vq.init)(key, jnp.zeros(vshape,
                                                  jnp.bfloat16))['params']

        @jax.jit
        def quant(p, x):
            zq, _, _ = vq.apply({'params': p}, x)
            return jnp.sum(zq.astype(jnp.float32))
        compare('vq', quant, vparams, vshape)


if __name__ == '__main__':
    main()
