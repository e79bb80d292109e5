#!/usr/bin/env python
"""Prefix-chain wall-clock attribution of the x4 serving forward.

VERDICT r4 #3: the 512px serving program measures ~157 ms/tile against a
118.8 ms HBM roofline (97.3 GB @ 819 GB/s) — a 38 ms gap that is either
dispatch/serialization overhead or a below-bandwidth segment. Standalone
segment probes (scripts/segment_probe.py) can't settle it: each segment
pays its own ~30 ms relay dispatch floor and runs with boundary layouts
the full program never materializes.

This probe times cumulative PREFIXES of the real forward instead —
encoder / +VQ / +after_quant / +decoder level k / full — each chained
K tiles per dispatch via lax.map (the shipped serving pattern,
models/inference.py fuse_chunks) with varied inputs per dispatch (the
relay value-cache rule). Successive differences attribute wall-clock to
segments *in context*; each prefix also reports its compiled
`bytes accessed`, so wall-delta vs byte-delta decides directly whether a
segment runs below HBM bandwidth.

Reference anchor: the tiling loop this serving path replaces is
/root/reference/basicsr/archs/femasr_arch.py:387-447; the forward being
sliced is femasr_arch.py:311-374 (ours: femasr_tpu/models/femasr_arch.py
encode_and_decode).

Usage (one watchdog phase per stage subset — cold compiles on a degraded
relay run 2-4 min each, so split across healthy windows):
  timeout 580 python scripts/serve_prefix_probe.py 512 --stages enc,vq
  timeout 580 python scripts/serve_prefix_probe.py 512 --stages aq,dec0
  timeout 580 python scripts/serve_prefix_probe.py 512 --stages dec1,full
"""
import argparse
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

STAGES = ('enc', 'vq', 'aq', 'dec0', 'dec1', 'dec2', 'full')
# intra-encoder prefixes (round-5: enc = 63.5 GB / 91.4 ms of the 512px
# program at 85% of its roofline — attribute the remaining 13.8 ms):
# in_conv / +down block / +k swin RSTB groups / +first up block; plain
# 'enc' is the full encoder (== up1)
ENC_STAGES = ('inconv', 'down', 'swin1', 'swin2', 'swin3', 'swin4', 'up0')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('tile', type=int, default=512, nargs='?')
    ap.add_argument('--chain', type=int, default=8,
                    help='K tiles per dispatch (bench.py headline uses 8)')
    ap.add_argument('--dispatches', type=int, default=3)
    ap.add_argument('--stages', default='enc,vq,dec0,dec1,full')
    ap.add_argument('--compile-only', action='store_true')
    args = ap.parse_args()

    import jax
    cache_dir = os.path.expanduser('~/.cache/femasr_tpu/jax_cache')
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
    import jax.numpy as jnp

    from femasr_tpu.models import FeMaSRNet

    t, K = args.tile, args.chain
    model = FeMaSRNet(codebook_params=[[32, 1024, 512]], LQ_stage=True,
                      scale_factor=4, norm_type='gn', act_type='silu',
                      dtype=jnp.bfloat16)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, t, t, 3), jnp.bfloat16))['params']

    def make_prefix(stage):
        """Replicates encode_and_decode (femasr_arch.py) up to `stage`.

        Every prefix RETURNS a checksum over all intermediates that are
        still live at that point in the FULL program (the encoder scale
        outputs feed decoder skips) — otherwise XLA dead-code-eliminates
        the not-yet-consumed encoder heads and the prefix deltas stop
        being segment costs (observed r5_prefix_enc: the vq prefix
        measured FEWER bytes and less wall than the enc prefix because
        enc[1], enc[2] were DCE'd)."""
        if stage in ENC_STAGES:
            def enc_fn(m, x):
                outs = m.multiscale_encoder(x, False, stop=stage)
                return sum(jnp.sum(o.astype(jnp.float32)) for o in outs)
            return enc_fn

        def fn(m, x):
            enc = m.multiscale_encoder(x, False)[-3:]
            live = sum(jnp.sum(o.astype(jnp.float32)) for o in enc)
            if stage == 'enc':
                return live
            feat = m.before_quant_group[0](enc[0])
            z_quant, cb_loss, _ = m.quantize_group[0](feat, None)
            if stage == 'vq':
                return live + jnp.sum(z_quant.astype(jnp.float32)) + cb_loss
            out = m.after_quant_group[0](z_quant, None)
            if stage == 'aq':
                return live + jnp.sum(out.astype(jnp.float32))
            for i in range(m.max_depth):
                if i > 0:
                    out = out + enc[i]
                out = m.decoder_group[i](out, False)
                if stage == f'dec{i}':
                    # enc heads > i stay live for later skips
                    tail = sum(jnp.sum(o.astype(jnp.float32))
                               for o in enc[i + 1:])
                    return tail + jnp.sum(out.astype(jnp.float32))
            return jnp.sum(m.out_conv(out).astype(jnp.float32))
        return fn

    def chained(stage):
        prefix = make_prefix(stage)

        @jax.jit
        def f(params, xs):
            return jnp.sum(jax.lax.map(
                lambda x: model.apply({'params': params}, x[None],
                                      method=prefix), xs))
        return f

    # time salt so repeated invocations never replay identical dispatches
    # into the relay's value cache (CLAUDE.md round-3 rule)
    salt = int(time.time() * 1e3) % 100003

    results = []
    for stage in args.stages.split(','):
        if stage not in STAGES and stage not in ENC_STAGES:
            print(f'# unknown stage {stage!r}; skipping', flush=True)
            continue
        f = chained(stage)
        t0 = time.perf_counter()
        compiled = f.lower(params, jnp.zeros((K, t, t, 3),
                                             jnp.bfloat16)).compile()
        tc = time.perf_counter() - t0
        ca = compiled.cost_analysis() or {}
        # HloCostAnalysis counts the lax.map/scan BODY ONCE (verified on
        # this jax build, NOTES_ROUND4.md session 3) — so the reported
        # figure IS per-tile already; do NOT divide by K (the original /K
        # here reproduced the round-4 '2% MFU' accounting bug and printed
        # enc at 7.9 GB when the real figure is ~63 GB).
        byts = float(ca.get('bytes accessed', 0))
        print(f'# {stage}: compile {tc:.1f}s, bytes/tile '
              f'{byts / 1e9:.2f} GB -> HBM roofline '
              f'{byts / 819e9 * 1e3:.1f} ms', flush=True)
        if args.compile_only:
            continue
        xss = [jax.random.uniform(
            jax.random.fold_in(jax.random.PRNGKey(salt), 7 * d + 1),
            (K, t, t, 3), jnp.bfloat16) for d in range(args.dispatches + 1)]
        float(f(params, xss[0]))  # warmup (real execution, host-fetch sync)
        t0 = time.perf_counter()
        rs = [f(params, xs) for xs in xss[1:]]
        _ = [float(r) for r in rs]
        dt = (time.perf_counter() - t0) / (args.dispatches * K)
        print(f'{stage}: {dt * 1e3:.1f} ms/tile (chainK={K}, '
              f'{args.dispatches} dispatches, roofline '
              f'{byts / 819e9 * 1e3:.1f} ms, '
              f'{dt * 819e9 * 1e-9:.1f} GB-equiv)', flush=True)
        results.append((stage, dt * 1e3, byts / 1e9))

    if len(results) > 1:
        print('# deltas (segment = prefix difference):', flush=True)
        for (s0, t0_, b0), (s1, t1_, b1) in zip(results, results[1:]):
            print(f'#   {s0}->{s1}: {t1_ - t0_:+.1f} ms wall, '
                  f'{(b1 - b0):+.2f} GB -> roofline '
                  f'{(b1 - b0) / 819 * 1e3:+.1f} ms', flush=True)


if __name__ == '__main__':
    main()
