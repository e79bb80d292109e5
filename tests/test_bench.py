"""bench.py parent-process logic (no TPU, no jax import in the parent).

The driver runs bench.py at end-of-round against whatever state the TPU
relay is in; these tests pin the properties that make that run safe:
TERM-first kills (a SIGKILLed in-flight relay command wedges the chip —
CLAUDE.md), and partial-stdout salvage so a stalled later compile cannot
lose an already-emitted measurement.
"""
import importlib.util
import json
import os
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


@pytest.fixture(scope='module')
def bench():
    spec = importlib.util.spec_from_file_location(
        'bench', os.path.join(REPO, 'bench.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_run_bounded_completes(bench):
    # -S skips the container sitecustomize (which imports jax and takes
    # seconds on the contended 1-core box)
    rc, out, err = bench._run_bounded(
        [sys.executable, '-S', '-c', 'print("hello")'], budget_s=30)
    assert rc == 0
    assert 'hello' in out


def test_run_bounded_timeout_salvages_stdout_and_terms(bench):
    # child prints a JSON measurement line, then stalls (a degraded-relay
    # compile). The parent must expire the budget WITHOUT SIGKILL-first,
    # and still return the partial stdout.
    prog = (
        'import json, signal, sys, time\n'
        # on TERM, exit cleanly and note it (TERM-first contract)
        'signal.signal(signal.SIGTERM,'
        ' lambda *a: (print("TERMED", flush=True), sys.exit(0)))\n'
        'print(json.dumps({"value": 1.5}), flush=True)\n'
        'time.sleep(120)\n'
    )
    rc, out, err = bench._run_bounded(
        [sys.executable, '-S', '-c', prog], budget_s=5)
    assert rc is None  # budget expired
    lines = out.splitlines()
    jline = next(ln for ln in lines if ln.startswith('{'))
    assert json.loads(jline) == {'value': 1.5}
    assert 'TERMED' in out  # SIGTERM (not SIGKILL) reached the child


def _run_ladder(bench, monkeypatch, capsys, warm, results):
    """Drive bench.main() with a stubbed child; return attempted tiles.

    `results` maps tile -> JSON line (success) or None (timeout/failure).
    """
    attempts = []

    def fake_run_bounded(argv, budget_s, env=None):
        tile = int(argv[-1])
        attempts.append(tile)
        jline = results.get(tile)
        if jline is None:
            return None, '', ''
        return 0, jline + '\n', ''

    monkeypatch.setattr(bench, '_run_bounded', fake_run_bounded)
    monkeypatch.setattr(bench, '_cache_warm', lambda: warm)
    monkeypatch.setenv('FEMASR_BENCH_SKIP_PROBE', '1')
    monkeypatch.delenv('FEMASR_BENCH_TILES', raising=False)
    monkeypatch.delenv('FEMASR_BENCH_ORDER', raising=False)
    bench.main()
    out = capsys.readouterr().out
    jline = next(ln for ln in reversed(out.splitlines())
                 if ln.startswith('{'))
    return attempts, json.loads(jline)


def test_warm_cache_runs_headline_rung_first_and_stops(
        bench, monkeypatch, capsys):
    # warm cache (the driver's end-of-round situation): 512 first, and a
    # success there must SKIP the smaller rungs (r4d_bench precedent:
    # degraded-window 128/256 attempts burned the chain variant's budget)
    ok = json.dumps({'metric': 'm', 'value': 1.665, 'unit': 'u',
                     'vs_baseline': 1.11})
    attempts, got = _run_ladder(bench, monkeypatch, capsys, warm=True,
                                results={512: ok, 256: ok, 128: ok})
    assert attempts == [512]
    assert got['value'] == 1.665


def test_warm_cache_falls_back_descending(bench, monkeypatch, capsys):
    ok = json.dumps({'metric': 'm', 'value': 1.74, 'unit': 'u',
                     'vs_baseline': 1.16})
    attempts, got = _run_ladder(bench, monkeypatch, capsys, warm=True,
                                results={512: None, 256: ok, 128: ok})
    assert attempts == [512, 256]
    assert got['value'] == 1.74


def test_cold_cache_keeps_smallest_first_ladder(bench, monkeypatch, capsys):
    # cold cache: the original ascending order stands (a cheap 128 compile
    # lands SOME number when the remote-compile helper is degraded), and
    # larger successes overwrite smaller fallbacks
    def j(v):
        return json.dumps({'metric': 'm', 'value': v, 'unit': 'u',
                           'vs_baseline': v})
    attempts, got = _run_ladder(
        bench, monkeypatch, capsys, warm=False,
        results={128: j(1.17), 256: j(1.74), 512: j(1.66)})
    assert attempts == [128, 256, 512]
    assert got['value'] == 1.66


def test_child_batch_ladder_policy(bench):
    # the headline tiles must not attempt the reproduced-loser batch 2
    # (3x-measured regression + a 2-4 min compile-stall risk at driver
    # collection time); 128px keeps it (measured faster there)
    src = open(os.path.join(REPO, 'bench.py')).read()
    assert "if tile == 128" in src
    assert 'FEMASR_BENCH_B2' in src
    # chain attempt must be budget-guarded so the parent never TERMs a
    # fresh chain compile mid-flight
    assert 'child_remaining() < 150' in src


def test_fail_json_prefers_banked_last_good(bench, monkeypatch, capsys,
                                            tmp_path):
    # VERDICT r4 missing#3: two of four driver captures recorded 0.0 when
    # the relay flapped through the window. A banked real measurement
    # (refreshed by every successful default-config 512 run) must be
    # emitted instead, clearly labeled STALE with its UTC timestamp.
    lg = tmp_path / 'last_good.json'
    lg.write_text(json.dumps({
        'metric': 'x4_sr_megapixels_per_sec_per_chip_512px_tiles',
        'value': 1.669, 'unit': 'MP/s orig-unit', 'vs_baseline': 1.113,
        'ts_utc': '2026-08-20 03:29:02'}))
    monkeypatch.setattr(bench, 'LAST_GOOD', str(lg))
    bench._fail_json('relay down')
    got = json.loads(capsys.readouterr().out.strip())
    assert got['value'] == 1.669
    assert got['vs_baseline'] == 1.113
    assert 'STALE' in got['unit']
    assert '2026-08-20 03:29:02' in got['unit']
    assert 'MP/s orig-unit' in got['unit']


def test_fail_json_without_bank_is_zero(bench, monkeypatch, capsys,
                                        tmp_path):
    monkeypatch.setattr(bench, 'LAST_GOOD', str(tmp_path / 'missing.json'))
    bench._fail_json('relay down')
    got = json.loads(capsys.readouterr().out.strip())
    assert got['value'] == 0.0
    assert got['vs_baseline'] is None


def test_ladder_retries_headline_rung_across_wall_budget(
        bench, monkeypatch, capsys):
    # VERDICT r4 next#2a: one bounded attempt per rung is not enough on a
    # flapping relay — after the ladder fails, the headline rung must be
    # retried (with varied-input salting in the child) until the wall
    # budget is nearly spent or a number lands.
    calls = []
    outcomes = [None, None, None, None,  # ladder (512,256,128) + retry 1
                json.dumps({'metric': 'm', 'value': 1.65, 'unit': 'u',
                            'vs_baseline': 1.1})]

    def fake_run_bounded(argv, budget_s, env=None):
        tile = int(argv[-1])
        calls.append(tile)
        out = outcomes[min(len(calls) - 1, len(outcomes) - 1)]
        return (0, out + '\n', '') if out else (None, '', '')

    monkeypatch.setattr(bench, '_run_bounded', fake_run_bounded)
    monkeypatch.setattr(bench, '_cache_warm', lambda: True)
    monkeypatch.setattr(bench.time, 'sleep', lambda s: None)
    monkeypatch.setenv('FEMASR_BENCH_SKIP_PROBE', '1')
    monkeypatch.delenv('FEMASR_BENCH_TILES', raising=False)
    monkeypatch.delenv('FEMASR_BENCH_ORDER', raising=False)
    bench.main()
    out = capsys.readouterr().out
    got = json.loads(next(ln for ln in reversed(out.splitlines())
                          if ln.startswith('{')))
    assert got['value'] == 1.65
    assert calls[:3] == [512, 256, 128]  # descending ladder first
    assert all(t == 512 for t in calls[3:])  # retries target the headline
    assert len(calls) == 5
