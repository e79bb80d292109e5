#!/usr/bin/env python
"""Headline benchmark: x4 SR throughput on 512px LQ tiles (BASELINE.json).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measurement notes: on this harness the TPU is reached through a relay where
`block_until_ready()` does NOT wait for real execution and numerically
identical dispatches can be served from a cache — so every timed iteration
uses a distinct input and is synchronized by fetching a scalar reduction to
the host; the relay round-trip latency is measured on a trivial op and
subtracted.

vs_baseline estimates the reference PyTorch implementation on one H100: the
generator costs F FLOPs per 512x512 input tile (XLA cost analysis). The
reference runs fp32/TF32 cuDNN without AMP or torch.compile
(inference_femasr.py:39-41); we credit it 25% of the 495 TFLOP/s TF32 peak
(123.75 TFLOP/s) on this conv+window-attention mix:
    baseline_mps = 123.75e12 / (F / MP_per_tile)
"""

import json
import time

import numpy as np

H100_TF32_PEAK = 495e12
H100_ASSUMED_UTIL = 0.25
TILE = 512
N_ITER = 6


def _timed_fetch(fn, args_list):
    """Sequential host-fetch timing; returns per-call seconds."""
    ts = []
    for args in args_list:
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return np.asarray(ts)


def main():
    # The TPU relay on this harness intermittently reports
    # "worker process crashed or restarted" after recoveries — retry the
    # whole measurement a few times before giving up.
    last = None
    for attempt in range(3):
        try:
            _run()
            return
        except Exception as e:  # noqa: BLE001
            last = e
            print(f'# attempt {attempt + 1} failed: '
                  f'{type(e).__name__}: {str(e)[:120]} — retrying',
                  flush=True)
            time.sleep(30)
    # the relay's remote compile helper sometimes cannot compile the 512px
    # program (known harness degradation; 0.69-0.70 MP/s measured when
    # healthy — see NOTES_ROUND1.md). Fall back to a smaller tile so a real
    # measurement is still recorded, clearly labeled.
    for tile in (256, 128):
        try:
            _run(tile=tile, fallback=True)
            return
        except Exception as e:  # noqa: BLE001
            last = e
            print(f'# fallback tile={tile} failed: {type(e).__name__}',
                  flush=True)
    print(json.dumps({
        'metric': 'x4_sr_megapixels_per_sec_per_chip_512px_tiles',
        'value': 0.0, 'unit': f'FAILED: {type(last).__name__} '
        '(relay compile helper down; 0.70 MP/s when healthy, see NOTES_ROUND1.md)',
        'vs_baseline': None}))


def _run(tile=TILE, fallback=False):
    import os

    import jax

    # persistent compilation cache: once a run has compiled successfully,
    # later runs (e.g. the driver's) skip the flaky remote compile helper
    cache_dir = os.path.expanduser('~/.cache/femasr_tpu/jax_cache')
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
    except Exception:
        pass

    import jax.numpy as jnp

    from femasr_tpu.models import FeMaSRNet

    # relay round-trip latency on a trivial op
    @jax.jit
    def triv(x):
        return x.sum()

    _ = float(triv(jnp.zeros((8,))))
    lat = float(np.median(_timed_fetch(
        triv, [(jnp.full((8,), i, jnp.float32),) for i in range(6)])))

    model = FeMaSRNet(codebook_params=[[32, 1024, 512]], LQ_stage=True,
                      scale_factor=4, norm_type='gn', act_type='silu',
                      dtype=jnp.bfloat16)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, tile, tile, 3), jnp.bfloat16))['params']

    @jax.jit
    def forward(params, x):
        out, _, _, _ = model.apply({'params': params}, x)
        return jnp.sum(out.astype(jnp.float32))

    flops_per_tile = None
    best_mps, best_batch = 0.0, 0
    for batch in (1, 2):
        try:
            compiled = forward.lower(
                params, jnp.zeros((batch, tile, tile, 3),
                                  jnp.bfloat16)).compile()
            if flops_per_tile is None:
                cost = compiled.cost_analysis()
                if cost and 'flops' in cost:
                    flops_per_tile = float(cost['flops']) / batch
            xs = [jax.random.uniform(jax.random.PRNGKey(100 + i),
                                     (batch, tile, tile, 3), jnp.bfloat16)
                  for i in range(N_ITER)]
            float(forward(params, xs[0]))  # warmup (real execution)
            # pipelined serving pattern: dispatch all, fetch at the end
            # (relay round-trip latency overlaps with compute)
            t0 = time.perf_counter()
            results = [forward(params, x) for x in xs]
            _ = [float(r) for r in results]
            dt = (time.perf_counter() - t0) / len(xs)
        except Exception as e:
            if batch == 1:
                raise  # first batch must work -> retry the whole run
            print(f'# batch {batch} failed: {type(e).__name__} (expected '
                  'OOM at this size)', flush=True)
            break
        mps = batch * tile * tile / 1e6 / dt
        print(f'# batch={batch}: {dt * 1e3:.1f} ms/iter pipelined '
              f'(relay latency {lat * 1e3:.1f} ms overlapped) '
              f'-> {mps:.2f} MP/s', flush=True)
        if mps > best_mps:
            best_mps, best_batch = mps, batch

    mp_per_tile = tile * tile / 1e6
    if flops_per_tile:
        baseline_mps = (H100_TF32_PEAK * H100_ASSUMED_UTIL
                        / (flops_per_tile / mp_per_tile))
        print(f'# {flops_per_tile / 1e12:.2f} TFLOP / 512px tile; assumed '
              f'H100-PyTorch baseline {baseline_mps:.2f} MP/s', flush=True)
    else:
        baseline_mps = float('nan')

    result = {
        'metric': 'x4_sr_megapixels_per_sec_per_chip_512px_tiles',
        'value': round(best_mps, 3),
        'unit': (f'MP/s (input pixels), bf16, batch {best_batch}'
                 + (f', FALLBACK {tile}px tiles (512px compile failed on '
                    'this relay)' if fallback else '')),
        'vs_baseline': round(best_mps / baseline_mps, 3)
        if np.isfinite(baseline_mps) else None,
    }
    print(json.dumps(result))


if __name__ == '__main__':
    main()
