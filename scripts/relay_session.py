#!/usr/bin/env python
"""One-window TPU measurement session: runs the round-3 experiment agenda
sequentially with per-phase subprocess budgets and a global wall budget.

Agenda (ordered: driver-critical first, wedge-risky last):
  1. health probe
  2. bench.py            <- warms the driver's 128/256/512 compile caches
  3. batch2_probe        <- localize the 3.4x batch-2 per-pixel regression
  4. attn_pack A/B       <- full-graph pack=2 + swin-segment + non-shifted
  5. s2d align probe     <- FEMASR_S2D_ALIGN=8 decoder-tail wall-clock
  6. fused_upsample A/B
  7. train chain         <- steps/s + MFU via --chain
  8. int8 conv probe
  9. pallas vq compile probe (most stall-prone -> LAST; one attempt only)

Run DETACHED (nohup/background), never under the Bash tool's 600 s
ceiling:  nohup python scripts/relay_session.py > /tmp/relay_session.log &

Wedge discipline (CLAUDE.md): each phase gets TERM then KILL with grace;
any phase timeout aborts the remaining agenda (a killed in-flight dispatch
may have wedged the chip — continuing would stack kills and extend the
wedge). Results land in /tmp/relay_session.log + RESULTS_FILE.
"""

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RESULTS_FILE = '/tmp/relay_session_results.json'

PY = sys.executable


def phase(name, cmd, budget_s, env_extra=None, abort_on_timeout=True):
    print(f'\n===== {name} (budget {budget_s}s) =====', flush=True)
    env = dict(os.environ)
    env.pop('JAX_PLATFORMS', None)  # phases run on the real chip
    if env_extra:
        env.update(env_extra)
    t0 = time.time()
    # TERM first with a grace window, KILL only as last resort: a
    # SIGKILLed in-flight relay dispatch wedges the chip (CLAUDE.md);
    # SIGTERM lets the JAX client unwind. subprocess.run(timeout=...)
    # would SIGKILL immediately — hence Popen.
    p = subprocess.Popen(cmd, cwd=HERE, env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
    try:
        out = p.communicate(timeout=budget_s)[0]
        ok = p.returncode == 0
    except subprocess.TimeoutExpired:
        p.terminate()
        try:
            out = p.communicate(timeout=30)[0]
        except subprocess.TimeoutExpired:
            p.kill()
            out = p.communicate()[0]
        out = (out or '') + f'\n<<TIMEOUT after {budget_s}s>>'
        ok = False
    dt = time.time() - t0
    print(out, flush=True)
    print(f'----- {name}: {"OK" if ok else "FAILED"} in {dt:.0f}s',
          flush=True)
    rec = {'name': name, 'ok': ok, 'seconds': round(dt, 1), 'tail': out[-2000:]}
    results.append(rec)
    with open(RESULTS_FILE, 'w') as f:
        json.dump(results, f, indent=1)
    if not ok and out.endswith('>>'):
        # Timed-out phase: usually a slow remote compile (recoverable),
        # not a wedged chip. Verify with a VARIED-value health probe (the
        # relay serves identical dispatches from a value cache, so the
        # standard arange probe can lie) and only abort if that fails.
        salt = int(time.time()) % 997
        try:
            hp = subprocess.run(
                [PY, '-c', f'import jax, jax.numpy as jnp; '
                 f'print("HOK", float(jnp.arange({salt + 4}.).sum()))'],
                cwd=HERE, env=os.environ, timeout=120,
                capture_output=True, text=True)
        except subprocess.TimeoutExpired:
            hp = None
        if hp is None or hp.returncode != 0 or 'HOK' not in hp.stdout:
            print(f'!! {name} timed out AND varied health probe failed — '
                  'chip likely wedged; aborting agenda', flush=True)
            sys.exit(2)
        print(f'!! {name} timed out but chip is healthy (slow compile) — '
              'cooling down 120s before continuing', flush=True)
        time.sleep(120)
    return ok


results = []


def main():
    t_start = time.time()
    global_budget = float(os.environ.get('RELAY_SESSION_BUDGET_S', 5400))

    def remaining():
        return global_budget - (time.time() - t_start)

    # 1. health (abort the whole session if the relay is down)
    ok = phase('health', [PY, '-c',
                          'import jax, jax.numpy as jnp; '
                          'print("RELAY_OK", float(jnp.arange(4.).sum()))'],
               90)
    if not ok:
        print('relay down; session aborted', flush=True)
        return

    # 2. driver bench — also leaves the 128/256/512 ladder caches warm
    phase('bench', [PY, 'bench.py'], 600)

    # 3. batch-2 regression localization
    if remaining() > 900:
        phase('batch2_full_enc', [PY, 'scripts/batch2_probe.py', '512',
                                  '--segments', 'full,encoder'], 900)
    if remaining() > 900:
        phase('batch2_swin_dec_vq', [PY, 'scripts/batch2_probe.py', '512',
                                     '--segments', 'swin,decoder,vq'], 900)

    # 4. attn_pack: full-graph pack=2, swin segment pack sweep, non-shifted
    if remaining() > 900:
        phase('pack2_full', [PY, 'scripts/perf_probe.py', '512', '1',
                             '--pack', '2'], 900)
    if remaining() > 900:
        phase('pack_swin_seg', [PY, 'scripts/segment_probe.py', '512',
                                '--swin-only', '--pack', '2'], 400)
    if remaining() > 900:
        phase('pack2_noshift_full', [PY, 'scripts/perf_probe.py', '512', '1',
                                     '--pack', '2', '--no-pack-shifted'],
              900)

    # 5. s2d decoder tail with aligned intermediates
    if remaining() > 900:
        phase('s2d_align8', [PY, 'scripts/perf_probe.py', '512', '1',
                             '--s2d'], 900,
              env_extra={'FEMASR_S2D_ALIGN': '8'})
    if remaining() > 900:
        phase('s2d_align1', [PY, 'scripts/perf_probe.py', '512', '1',
                             '--s2d'], 900)

    # 6. fused upsample (encoder up blocks + decoder)
    if remaining() > 900:
        phase('fused_full', [PY, 'scripts/perf_probe.py', '512', '1',
                             '--fused'], 900)

    # 7. training-step truth: chained dispatch
    if remaining() > 1200:
        phase('train_chain8', [PY, 'scripts/train_step_probe.py', '--gt',
                               '256', '--batch', '8', '--dtype', 'bfloat16',
                               '--chain', '8', '--iters', '16'], 900)

    # 8. int8: raw conv probe + the actual int8_tail model A/B
    if remaining() > 700:
        phase('int8_conv', [PY, 'scripts/int8_conv_probe.py'], 560)
    if remaining() > 700:
        phase('int8_tail_full', [PY, 'scripts/perf_probe.py', '512', '1',
                                 '--int8'], 900)
    if remaining() > 700:
        phase('int8_all_levels', [PY, 'scripts/perf_probe.py', '512', '1',
                                  '--int8', '--int8-levels', '3'], 900)

    # 9. final bench re-run on fully warm caches (the number the driver
    # should see; also re-warms anything the earlier phases evicted)
    if remaining() > 650:
        phase('bench_warm', [PY, 'bench.py'], 600)

    # 10. pallas vq native compile probe — LAST (stalls the remote compile
    # helper on this relay; one bounded attempt, then stop uncondition-
    # ally so a stall cannot poison anything after it)
    if remaining() > 400 and os.environ.get('RELAY_SESSION_PALLAS', '1') == '1':
        phase('pallas_vq_compile',
              [PY, '-c', (
                  'import jax, jax.numpy as jnp;'
                  'from femasr_tpu.ops.pallas.vq import vq_argmin;'
                  'f = jax.jit(vq_argmin);'
                  'c = f.lower(jnp.zeros((1024, 512), jnp.float32),'
                  '            jnp.zeros((1024, 512), jnp.float32)).compile();'
                  'print("PALLAS_COMPILE_OK");'
                  'import numpy as np;'
                  'z = jnp.asarray(np.random.default_rng(0).normal('
                  '    size=(1024, 512)), jnp.float32);'
                  'cb = jnp.asarray(np.random.default_rng(1).normal('
                  '    size=(1024, 512)), jnp.float32);'
                  'idx = np.asarray(f(z, cb));'
                  'ref = np.asarray(jnp.argmin('
                  '  jnp.sum((z[:, None, :] - cb[None]) ** 2, -1), 1));'
                  'print("PALLAS_EXEC_OK match:", (idx == ref).all())')],
              300, abort_on_timeout=True)

    print(f'\nsession done in {time.time() - t_start:.0f}s; results in '
          f'{RESULTS_FILE}', flush=True)


if __name__ == '__main__':
    main()
