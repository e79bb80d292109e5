#!/usr/bin/env python
"""Headline benchmark: x4 SR throughput on 512px LQ tiles (BASELINE.json).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline estimates the reference PyTorch implementation on one H100:
the generator costs ~F FLOPs per 512x512 input tile (measured via XLA cost
analysis). The reference runs fp32/TF32 cuDNN without AMP or torch.compile
(inference_femasr.py:39-41); a well-tuned torch eager conv/attention mix on
H100 sustains ~20-25% of the 495 TFLOP/s TF32 peak on this mixed
conv+window-attention graph. We credit it 25% (123.75 TFLOP/s):
    baseline_mps = 123.75e12 / (F / MP_per_tile)
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

H100_TF32_PEAK = 495e12
H100_ASSUMED_UTIL = 0.25


def main():
    from femasr_tpu.models import FeMaSRNet

    tile = 512
    model = FeMaSRNet(codebook_params=[[32, 1024, 512]], LQ_stage=True,
                      scale_factor=4, norm_type='gn', act_type='silu',
                      dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    params = jax.jit(model.init)(rng, jnp.zeros((1, tile, tile, 3),
                                                jnp.bfloat16))['params']

    @jax.jit
    def forward(params, x):
        out, _, _, _ = model.apply({'params': params}, x)
        return jnp.clip(out.astype(jnp.float32), 0.0, 1.0)

    best_mps = 0.0
    best_batch = 1
    flops_per_tile = None
    for batch in (1, 2, 4):
        x = jax.random.uniform(jax.random.PRNGKey(1),
                               (batch, tile, tile, 3), jnp.bfloat16)
        try:
            lowered = forward.lower(params, x)
            compiled = lowered.compile()
            if flops_per_tile is None:
                cost = compiled.cost_analysis()
                if cost and 'flops' in cost:
                    flops_per_tile = float(cost['flops']) / batch
            out = forward(params, x)
            out.block_until_ready()
        except Exception as e:  # OOM at this batch
            print(f'# batch {batch} failed: {type(e).__name__}', flush=True)
            break
        # timed runs
        n_iter = 8
        t0 = time.perf_counter()
        for _ in range(n_iter):
            out = forward(params, x)
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / n_iter
        mp = batch * tile * tile / 1e6
        mps = mp / dt
        print(f'# batch={batch}: {dt * 1e3:.1f} ms/iter, {mps:.2f} MP/s',
              flush=True)
        if mps > best_mps:
            best_mps, best_batch = mps, batch

    mp_per_tile = tile * tile / 1e6
    if flops_per_tile:
        baseline_mps = (H100_TF32_PEAK * H100_ASSUMED_UTIL
                        / (flops_per_tile / mp_per_tile))
        print(f'# measured {flops_per_tile / 1e12:.2f} TFLOP / 512px tile; '
              f'assumed H100-PyTorch baseline {baseline_mps:.2f} MP/s',
              flush=True)
    else:
        baseline_mps = float('nan')

    result = {
        'metric': 'x4_sr_megapixels_per_sec_per_chip_512px_tiles',
        'value': round(best_mps, 3),
        'unit': 'MP/s (input pixels), bf16, batch %d' % best_batch,
        'vs_baseline': round(best_mps / baseline_mps, 3)
        if np.isfinite(baseline_mps) else None,
    }
    print(json.dumps(result))


if __name__ == '__main__':
    main()
