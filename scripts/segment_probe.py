#!/usr/bin/env python
"""Per-segment timing of the x4 generator at a given LQ tile size.

Times standalone jitted sub-models (encoder incl. swin / swin alone /
decoder chain / VQ) with the relay-honest methodology (distinct inputs,
host-fetch sync, pipelined dispatch). Run under `timeout`.
"""
import argparse
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def bench(fn, xs):
    fn(xs[0]).block_until_ready()
    float(fn(xs[0]))  # real sync via host fetch
    t0 = time.perf_counter()
    rs = [fn(x) for x in xs]
    _ = [float(r) for r in rs]
    return (time.perf_counter() - t0) / len(xs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('tile', type=int, default=512, nargs='?')
    ap.add_argument('--iters', type=int, default=6)
    ap.add_argument('--fused', action='store_true')
    ap.add_argument('--swin-only', action='store_true')
    args = ap.parse_args()

    import jax
    cache_dir = os.path.expanduser('~/.cache/femasr_tpu/jax_cache')
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
    import jax.numpy as jnp

    from femasr_tpu.models import FeMaSRNet
    from femasr_tpu.models.femasr_arch import DecoderBlock
    from femasr_tpu.ops.layers import conv2d
    from femasr_tpu.ops.swin import SwinLayers

    t = args.tile
    key = jax.random.PRNGKey(0)

    def inputs(shape, n):
        return [jax.random.uniform(jax.random.PRNGKey(50 + i), shape,
                                   jnp.bfloat16) for i in range(n)]

    model = FeMaSRNet(codebook_params=[[32, 1024, 512]], LQ_stage=True,
                      scale_factor=4, norm_type='gn', act_type='silu',
                      fused_upsample=args.fused,
                      dtype=jnp.bfloat16)
    params = jax.jit(model.init)(key, jnp.zeros((1, t, t, 3),
                                                jnp.bfloat16))['params']

    if not args.swin_only:
        # 1. encoder (in_conv + down + swin + 2 up blocks)
        @jax.jit
        def enc(x):
            outs = model.apply({'params': params}, x,
                               method=lambda m, x: m.multiscale_encoder(x))
            return sum(jnp.sum(o.astype(jnp.float32)) for o in outs)

        dt = bench(enc, inputs((1, t, t, 3), args.iters))
        print(f'encoder(full): {dt * 1e3:.1f} ms', flush=True)

    # 2. swin alone at the deepest encoder resolution (t/2, 256ch)
    sw = SwinLayers(dtype=jnp.bfloat16)
    sshape = (1, t // 2, t // 2, 256)
    sparams = jax.jit(sw.init)(key, jnp.zeros(sshape, jnp.bfloat16))['params']

    @jax.jit
    def swin(x):
        return jnp.sum(sw.apply({'params': sparams}, x).astype(jnp.float32))

    dt = bench(swin, inputs(sshape, args.iters))
    print(f'swin(4xRSTB @{t // 2}px 256ch): '
          f'{dt * 1e3:.1f} ms', flush=True)
    if args.swin_only:
        return

    # 3. decoder chain: 3 DecoderBlocks + out_conv from (t/2, 256ch)
    blocks = [DecoderBlock(256, 'gn', 'silu', args.fused, jnp.bfloat16),
              DecoderBlock(128, 'gn', 'silu', args.fused, jnp.bfloat16),
              DecoderBlock(64, 'gn', 'silu', args.fused, jnp.bfloat16)]
    oc = conv2d(3, 3, 1, 1, dtype=jnp.bfloat16)
    shapes = [(1, t // 2, t // 2, 256), (1, t, t, 256), (1, 2 * t, 2 * t, 128)]
    bparams = [jax.jit(b.init)(key, jnp.zeros(s, jnp.bfloat16))['params']
               for b, s in zip(blocks, shapes)]
    ocparams = jax.jit(oc.init)(key, jnp.zeros((1, 4 * t, 4 * t, 64),
                                               jnp.bfloat16))['params']

    @jax.jit
    def dec(x):
        for b, p in zip(blocks, bparams):
            x = b.apply({'params': p}, x)
        x = oc.apply({'params': ocparams}, x)
        return jnp.sum(x.astype(jnp.float32))

    dt = bench(dec, inputs(shapes[0], args.iters))
    print(f'decoder(3 blocks + out_conv): {dt * 1e3:.1f} ms', flush=True)

    # 4. per decoder level
    for i, (b, p, s) in enumerate(zip(blocks, bparams, shapes)):
        @jax.jit
        def one(x, b=b, p=p):
            return jnp.sum(b.apply({'params': p}, x).astype(jnp.float32))
        dt = bench(one, inputs(s, args.iters))
        print(f'  decoder level {i} {s}: {dt * 1e3:.1f} ms', flush=True)

    # 5. VQ at codebook resolution
    from femasr_tpu.ops.quantize import VectorQuantizer
    vq = VectorQuantizer(n_e=1024, e_dim=512, lq_stage=True,
                         dtype=jnp.bfloat16)
    vshape = (1, t // 2, t // 2, 512)
    vparams = jax.jit(vq.init)(key, jnp.zeros(vshape, jnp.bfloat16))['params']

    @jax.jit
    def quant(x):
        zq, _, _ = vq.apply({'params': vparams}, x)
        return jnp.sum(zq.astype(jnp.float32))

    dt = bench(quant, inputs(vshape, args.iters))
    print(f'VQ @{t // 2}px e512 n1024: {dt * 1e3:.1f} ms', flush=True)


if __name__ == '__main__':
    main()
