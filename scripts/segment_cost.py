#!/usr/bin/env python
"""Static roofline table for the x4 serving model, per segment.

Compiles each segment (CPU backend — no TPU needed, XLA cost_analysis
FLOP counts are algebraic) and prints FLOPs, bytes accessed, arithmetic
intensity, and the v5e roofline-implied time: max(FLOPs/197 TF/s,
bytes/819 GB/s). Segment definitions mirror scripts/batch2_probe.py so
the table lines up with the measured relay numbers (NOTES_ROUND3.md).

Caveat: "bytes accessed" comes from the CPU-optimized HLO, whose fusion
decisions differ from TPU — treat it as an upper-bound indicator, not a
TPU HBM-traffic measurement.

Usage: JAX_PLATFORMS=cpu python scripts/segment_cost.py [TILE]
"""
import argparse
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

V5E_BF16_FLOPS = 197e12
V5E_HBM_BPS = 819e9


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('tile', type=int, default=512, nargs='?')
    ap.add_argument('--segments', default='full,encoder,swin,decoder,vq')
    args = ap.parse_args()
    segs = set(args.segments.split(','))

    import jax
    import jax.numpy as jnp

    from femasr_tpu.models import FeMaSRNet
    from femasr_tpu.models.femasr_arch import DecoderBlock
    from femasr_tpu.ops.layers import conv2d
    from femasr_tpu.ops.quantize import VectorQuantizer
    from femasr_tpu.ops.swin import SwinLayers

    t = args.tile
    key = jax.random.PRNGKey(0)
    rows = []

    def cost(name, fn, fn_params, shape):
        c = jax.jit(fn).lower(fn_params,
                              jnp.zeros(shape, jnp.bfloat16)).compile()
        ca = c.cost_analysis() or {}
        flops = float(ca.get('flops', 0))
        byts = float(ca.get('bytes accessed', 0))
        t_mxu = flops / V5E_BF16_FLOPS
        t_hbm = byts / V5E_HBM_BPS
        rows.append((name, flops, byts, t_mxu, t_hbm))
        print(f'  {name:10s} {flops / 1e12:7.3f} TFLOP  '
              f'{byts / 1e9:7.2f} GB  AI={flops / max(byts, 1):6.0f}  '
              f'roofline={max(t_mxu, t_hbm) * 1e3:6.1f} ms '
              f'({"MXU" if t_mxu >= t_hbm else "HBM"}-bound)', flush=True)

    model = FeMaSRNet(codebook_params=[[32, 1024, 512]], LQ_stage=True,
                      scale_factor=4, norm_type='gn', act_type='silu',
                      dtype=jnp.bfloat16)
    params = jax.jit(model.init)(key, jnp.zeros((1, t, t, 3),
                                                jnp.bfloat16))['params']

    print(f'tile={t} bf16 — v5e roofline (197 TF/s, 819 GB/s):', flush=True)

    if 'full' in segs:
        def forward(params, x):
            out, _, _, _ = model.apply({'params': params}, x)
            return jnp.sum(out.astype(jnp.float32))
        cost('full', forward, params, (1, t, t, 3))

    if 'encoder' in segs:
        def enc(params, x):
            outs = model.apply({'params': params}, x,
                               method=lambda m, x: m.multiscale_encoder(x))
            return sum(jnp.sum(o.astype(jnp.float32)) for o in outs)
        cost('encoder', enc, params, (1, t, t, 3))

    if 'swin' in segs:
        sw = SwinLayers(dtype=jnp.bfloat16)
        sshape = (1, t // 2, t // 2, 256)
        sparams = jax.jit(sw.init)(key, jnp.zeros(sshape,
                                                  jnp.bfloat16))['params']

        def swin(p, x):
            return jnp.sum(sw.apply({'params': p}, x).astype(jnp.float32))
        cost('swin', swin, sparams, sshape)

    if 'decoder' in segs:
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

        def dec(ps, x):
            for b, p in zip(blocks, ps[:-1]):
                x = b.apply({'params': p}, x)
            x = oc.apply({'params': ps[-1]}, x)
            return jnp.sum(x.astype(jnp.float32))
        cost('decoder', dec, tuple(bparams) + (ocparams,), shapes[0])
        for i, (blk, p, s) in enumerate(zip(blocks, bparams, shapes)):
            def one(p, x, blk=blk):
                return jnp.sum(blk.apply({'params': p},
                                         x).astype(jnp.float32))
            cost(f'dec_lvl{i}', one, p, s)

    if 'vq' in segs:
        vq = VectorQuantizer(n_e=1024, e_dim=512, lq_stage=True,
                             dtype=jnp.bfloat16)
        vshape = (1, t // 2, t // 2, 512)
        vparams = jax.jit(vq.init)(key, jnp.zeros(vshape,
                                                  jnp.bfloat16))['params']

        def quant(p, x):
            zq, _, _ = vq.apply({'params': p}, x)
            return jnp.sum(zq.astype(jnp.float32))
        cost('vq', quant, vparams, vshape)

    tot_f = sum(r[1] for r in rows if r[0] != 'full')
    print(f'  (sum of non-full segments: {tot_f / 1e12:.3f} TFLOP)',
          flush=True)


if __name__ == '__main__':
    main()
