#!/usr/bin/env python
"""Compile-only 'bytes accessed' A/B over arbitrary env-knob variants.

The 512px serving program runs at ~94% of its HBM roofline on the v5e
(NOTES_ROUND3.md), so the compiled program's byte count predicts
wall-clock without executing anything — each variant costs one remote
compile (cached thereafter). Generalizes scripts/gn_ab_probe.py to any
combination of the FEMASR_* formulation knobs (GN_IMPL, UPCONV, ...).

Usage:
  timeout 880 python scripts/byte_probe.py 512 1 \
      --set '' --set FEMASR_UPCONV=tc \
      --set FEMASR_UPCONV=tc,FEMASR_GN_IMPL=chanraw
"""
import argparse
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

KNOBS = ('FEMASR_GN_IMPL', 'FEMASR_UPCONV', 'FEMASR_S2D_ALIGN',
         'FEMASR_LN_IMPL', 'FEMASR_ATTN')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('tile', type=int, default=512, nargs='?')
    ap.add_argument('batch', type=int, default=1, nargs='?')
    ap.add_argument('--set', action='append', default=[],
                    help="comma-separated ENV=VAL list; '' = baseline. "
                         'Repeat for each variant.')
    args = ap.parse_args()
    variants = args.set or ['']

    import jax
    cache_dir = os.path.expanduser('~/.cache/femasr_tpu/jax_cache')
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
    import jax.numpy as jnp
    from femasr_tpu.models import FeMaSRNet

    t = args.tile
    for variant in variants:
        for k in KNOBS:
            os.environ.pop(k, None)
        mkw = {}
        for kv in filter(None, variant.split(',')):
            k, _, v = kv.partition('=')
            if k.startswith('MODEL.'):
                mkw[k[6:]] = (v in ('1', 'true', 'True')
                              if v in ('0', '1', 'true', 'True', 'false',
                                       'False') else int(v))
            else:
                os.environ[k] = v
        model = FeMaSRNet(codebook_params=[[32, 1024, 512]], LQ_stage=True,
                          scale_factor=4, norm_type='gn', act_type='silu',
                          dtype=jnp.bfloat16, **mkw)
        params = jax.eval_shape(
            model.init, jax.random.PRNGKey(0),
            jnp.zeros((1, t, t, 3), jnp.bfloat16))['params']
        params = jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype), params)

        def forward(params, x):
            out, _, _, _ = model.apply({'params': params}, x)
            return jnp.sum(out.astype(jnp.float32))

        t0 = time.perf_counter()
        c = jax.jit(forward).lower(
            params,
            jnp.zeros((args.batch, t, t, 3), jnp.bfloat16)).compile()
        ca = c.cost_analysis() or {}
        b = float(ca.get('bytes accessed', 0))
        label = variant or '(baseline)'
        print(f'{label:44s} b{args.batch} compile '
              f'{time.perf_counter() - t0:6.1f}s  {b / 1e9:7.2f} GB -> '
              f'HBM roofline {b / 819e9 * 1e3:6.1f} ms', flush=True)


if __name__ == '__main__':
    main()
