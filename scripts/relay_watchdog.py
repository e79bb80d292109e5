#!/usr/bin/env python
"""Persistent TPU measurement watchdog for a FLAPPING relay.

The relay comes up for minutes at a time between outages (round-3 log:
~10 h down, 20 min up, 25 min down, <1 min up...). A one-shot agenda
wastes windows; this watchdog loops forever (bounded by
RELAY_WATCHDOG_BUDGET_S, default 6 h):

  probe (varied value, 90 s) -> on success run the NEXT pending phase
  from the priority queue -> re-probe -> continue while healthy;
  on failure sleep RELAY_WATCHDOG_SLEEP_S (default 600) and retry.

Completed phases persist in STATE_FILE so progress accumulates across
watchdog restarts. Phase list is priority-ordered: the driver bench
first (warm caches -> real BENCH number), then the round-3 experiments.

Run DETACHED:
  nohup python scripts/relay_watchdog.py > /tmp/relay_watchdog.log 2>&1 &
"""

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STATE_FILE = '/tmp/relay_watchdog_state.json'
PY = sys.executable

# (name, cmd, budget_s, env_extra, repeatable)
# Priority-ordered for SCARCE healthy windows (~3 per 4 h observed):
# decision-making levers first (each directly changes the shipped default
# or produces a VERDICT done-criterion number), attribution/diagnosis after.
#
# ROUND 4 agenda. Context (recovered from the 2026-08-19 01:54-02:30
# watchdog run on this container): bench captured 1.669 MP/s vs_baseline
# 1.112 (ladder caches warm); train_state_probe showed the donated
# TrainState round-trip is 36 ms (state shipping is NOT the gap);
# train_gen32 measured 6403 ms/step at 1% MFU with zero H2D — the step
# program itself runs ~56x its 114.5 ms HBM roofline. Round-4 priorities:
# (1) keep the bench banked+warm, (2) attribute the 56x with the segment
# probe, (3) fresh HLO dumps for the swin byte hunt, (4) the bounded
# Pallas attempt (VERDICT r3 #4) in the MIDDLE of the agenda so a wedge
# has hours to recover before the driver's end-of-round collection.
# [2026-08-19 session 4] These phases all COMPLETED (results in
# NOTES_ROUND4.md); kept for the record as AGENDA_R4_DONE. The live
# close-out queue is the new AGENDA defined after it.
AGENDA_R4_DONE = [
    ('r4_bench', [PY, 'bench.py'], 600,
     {'FEMASR_BENCH_SKIP_PROBE': '1'}, False),
    # fresh per-op attribution + full dump of the current 97.3 GB default
    # program (offline swin byte-hunt raw material; compile-only, warm)
    ('r4_hlo_dump', [PY, 'scripts/hlo_bytes.py', '512', '--top', '40',
                     '--scope-depth', '4',
                     '--dump', '/tmp/hlo_r4_b1.txt'], 880, None, False),
    # training-step attribution (the 1%-MFU question): segments in rising
    # compile-cost order; each phase independently useful
    ('r4_seg_a', [PY, 'scripts/train_segment_probe.py',
                  '--segments', 'deg,hq'], 880, None, False),
    ('r4_seg_b', [PY, 'scripts/train_segment_probe.py',
                  '--segments', 'g_fwd,g_grad'], 880, None, False),
    ('r4_seg_c', [PY, 'scripts/train_segment_probe.py',
                  '--segments', 'd_grad,adam'], 880, None, False),
    ('r4_seg_full', [PY, 'scripts/train_segment_probe.py',
                     '--segments', 'full'], 880, None, False),
    # degradation share, directly: the gen-chain MFU probe minus the
    # on-device BSRGAN pipeline
    ('r4_gen32_nodeg', [PY, 'scripts/train_step_probe.py', '--gt', '256',
                        '--batch', '8', '--dtype', 'bfloat16',
                        '--no-degrade', '--gen-chain', '32',
                        '--iters', '64'], 900, None, False),
    # winmajor full dump for the op-by-op diff vs /tmp/hlo_r4_b1.txt
    # (VERDICT r3 weak#1: explain why the projected -10..12 GB vanished)
    ('r4_hlo_dump_wm', [PY, 'scripts/hlo_bytes.py', '512', '--top', '40',
                        '--scope-depth', '4',
                        '--dump', '/tmp/hlo_r4_b1_wm.txt'], 880,
     {'FEMASR_SWIN_LAYOUT': 'winmajor'}, False),
]

AGENDA_OLD_R3 = [
    # --- round-3 session-2 priorities -------------------------------------
    # The serving program runs at ~94% of HBM roofline (bench_bytes:
    # 171.6 GB -> 209.6 ms vs 224 ms healthy) — bytes are wall-clock.
    # gn_fix: GroupNorm stats now reduce channel-last (the old
    # (B,HW,G,C/G) reshape put C/G=2 in the lane dim at the C=64 tail —
    # 64x tile padding if materialized; prime suspect for the decoder
    # segment running 2x its CPU-estimated byte budget AND for the
    # batch-2 decoder regression). NEW program: compile 2-4 min degraded.
    ('gn_fix_full', [PY, 'scripts/perf_probe.py', '512', '1'], 900, None,
     False),
    # RESULT 15:17: chanlast GN = 195.4 GB vs grouped 171.6 — reverted to
    # grouped default; compile-only byte A/B over all four stat forms
    # decides (fused variadic-reduce variants are the new candidates)
    ('gn_ab', [PY, 'scripts/gn_ab_probe.py', '512'], 880, None, False),
    # gn_ab RESULT 15:44 (perf_probe program family): grouped(f32-cast-
    # first) 210.8, grouped_fused 203.3, chanlast 195.4, chanlast_fused
    # 305.8 (variadic reduce materializes both operands — removed).
    # Fixes landed: grouped restored to bench's bf16-reshape-first
    # ordering (171.6 GB); new 'chanraw' = shift-free channel-last
    # sibling reduces straight off the conv-layout bf16 tensor — the
    # minimum-traffic form. This A/B decides the default.
    ('gn_ab2', [PY, 'scripts/gn_ab_probe.py', '512'], 880, None, False),
    # batch-2: hlo_bytes_b2 showed the 1.69x decoder regression is
    # batch-interleaved layouts (copies {4,2,1,3,0}) + norm moment
    # fusions materializing BOTH f32 tensors (590 GB vs 2x171.6). The
    # grouped (B,HW,G,C/G) reshape is the prime layout-pressure suspect;
    # chanraw reduces in the conv's native layout. Decides training-step
    # structure too (b8 has the same pathology).
    ('gn_ab2_b2', [PY, 'scripts/gn_ab_probe.py', '512', '2'], 880, None,
     False),
    # per-instruction TPU traffic attribution (grouped program is
    # cache-warm: compile-only, fast)
    ('hlo_bytes_tpu', [PY, 'scripts/hlo_bytes.py', '512', '--top', '40',
                       '--scope-depth', '4'], 900, None, False),
    # re-attribution of the RESTORED 171.6 GB program (hlo_bytes_tpu ran
    # against the 210.8 GB bad-ordering build) + full HLO dump for
    # offline analysis
    ('hlo_bytes_tpu2', [PY, 'scripts/hlo_bytes.py', '512', '--top', '40',
                        '--scope-depth', '4',
                        '--dump', '/tmp/hlo_tpu_512_b1.txt'], 900, None,
     False),
    # train-step program byte attribution (the 2%-MFU question): compile-
    # only + HLO dump; b8 likely shares the b2 layout pathology
    ('train_bytes', [PY, 'scripts/train_step_probe.py', '--gt', '256',
                     '--batch', '8', '--dtype', 'bfloat16',
                     '--compile-only', '--dump-hlo',
                     '/tmp/hlo_tpu_train_b8.txt'], 900, None, False),
    # upconv formulation byte A/B: plain (broadcast+pad+copy chain,
    # 14.8 GB/level) vs single lhs-dilated conv vs phase-conv+shuffle
    ('hlo_bytes_upconv', [PY, 'scripts/byte_probe.py', '512', '1',
                          '--set', 'FEMASR_UPCONV=tc',
                          '--set', 'FEMASR_UPCONV=fused'], 880, None,
     False),
    # s2d under chanraw: the C=64 decoder tail still pads 64->128 lanes
    # on every tensor; s2d (4C=256 @ half res) fills the lanes
    ('hlo_bytes_s2d', [PY, 'scripts/byte_probe.py', '512', '1',
                       '--set', 'MODEL.s2d_tail=1',
                       '--set', 'MODEL.s2d_tail=1,FEMASR_S2D_ALIGN=8'],
     880, None, False),
    # LayerNormTPU (streaming lane-reduce stats) vs flax nn.LayerNorm
    # (materializes the f32 cast: ~0.4 GB/LN at the swin res, 48 LNs)
    ('hlo_bytes_ln', [PY, 'scripts/byte_probe.py', '512', '1',
                      '--set', '', '--set', 'FEMASR_LN_IMPL=flax'],
     880, None, False),
    # attn_pack bytes under the new norm stack (wall-clock A/Bs were
    # confounded by the old GroupNorm; bytes settle it)
    ('hlo_bytes_pack', [PY, 'scripts/byte_probe.py', '512', '1',
                        '--set', 'MODEL.attn_pack=2',
                        '--set', 'MODEL.attn_pack=4'], 880, None, False),
    # transpose-free dot_general window attention (no partition/reverse
    # copies — 16.7 GB across blocks_1 in the per-op attribution)
    ('hlo_bytes_attn', [PY, 'scripts/byte_probe.py', '512', '1',
                        '--set', 'FEMASR_ATTN=nhwc'], 880, None, False),
    # first bench with the round-3 session-2 defaults (chanraw GN +
    # LayerNormTPU + tc upconv = 97.3 GB, roofline 118.8 ms -> ~2.0 MP/s
    # at the measured 94% efficiency): warms the driver's ladder caches
    # and records the number
    ('bench_newdefaults', [PY, 'bench.py'], 600,
     {'FEMASR_BENCH_SKIP_PROBE': '1'}, False),
    # HIGHEST PRIORITY after the session-3 restart (22:4x UTC): the qkv
    # minor-dim-slice commit changed the 512 b1 program -> the headline
    # cache entry is COLD. Warm it + record the byte delta FIRST so the
    # driver's end-of-round bench finds a warm cache whatever happens.
    # (expected ~-5 GB: the (B_,N,3,nh,hd) reshape copied 100 MB/block)
    ('hlo_bytes_qkv', [PY, 'scripts/byte_probe.py', '512', '1'],
     600, None, False),
    # fresh headline number on the qkv program (cache now warm: fast)
    ('bench_qkv', [PY, 'bench.py'], 600,
     {'FEMASR_BENCH_SKIP_PROBE': '1'}, False),
    # window-major swin residual groups (partition once per RSTB; SW-MSA
    # shift = static row gather): kills the per-block partition/reverse
    # staging copies — 18.4 GB of no-metadata copy traffic attributed
    # inside blocks_1 on the 97.9 GB dump. Bit-exact (test_parity_ops).
    ('hlo_bytes_winmajor', [PY, 'scripts/byte_probe.py', '512', '1',
                            '--set', 'FEMASR_SWIN_LAYOUT=winmajor'],
     880, None, False),
    # wall-clock of the winmajor program (cache warm from the byte probe;
    # if the byte probe says winmajor loses, mark this done in STATE_FILE)
    ('bench_winmajor', [PY, 'bench.py'], 600,
     {'FEMASR_BENCH_SKIP_PROBE': '1', 'FEMASR_SWIN_LAYOUT': 'winmajor'},
     False),
    # per-op attribution + dump of the winmajor program (the next
    # byte-hunt round's raw material, if winmajor wins the A/B)
    ('hlo_bytes_tpu_wm', [PY, 'scripts/hlo_bytes.py', '512', '--top', '40',
                          '--scope-depth', '4',
                          '--dump', '/tmp/hlo_tpu_512_b1_wm.txt'], 900,
     {'FEMASR_SWIN_LAYOUT': 'winmajor'}, False),
    # warm the driver-bench ladder's remaining compile-cache entries
    # (compile-only)
    ('hlo_bytes_warm256', [PY, 'scripts/byte_probe.py', '256', '1'],
     600, None, False),
    ('hlo_bytes_warm128', [PY, 'scripts/byte_probe.py', '128', '1'],
     600, None, False),
    ('hlo_bytes_warm512b2', [PY, 'scripts/byte_probe.py', '512', '2'],
     600, None, False),
    ('hlo_bytes_warm256b2', [PY, 'scripts/byte_probe.py', '256', '2'],
     600, None, False),
    ('hlo_bytes_warm128b2', [PY, 'scripts/byte_probe.py', '128', '2'],
     600, None, False),
    # fresh per-op attribution + dump of the 97.3 GB default program
    # (chanraw + LNTPU + tc) for the next byte-hunt round
    ('hlo_bytes_tpu3', [PY, 'scripts/hlo_bytes.py', '512', '--top', '40',
                        '--scope-depth', '4',
                        '--dump', '/tmp/hlo_tpu_512_b1_v2.txt'], 900, None,
     False),
    # (swin deep attribution happens OFFLINE from the hlo_bytes_tpu2
    # dump — scripts/hlo_bytes.py gained --filter for that)
    # batch-2 program attribution (the decoder 1.69x per-pixel anomaly)
    ('hlo_bytes_b2', [PY, 'scripts/hlo_bytes.py', '512', '2', '--top',
                      '30', '--scope-depth', '4',
                      '--dump', '/tmp/hlo_tpu_512_b2.txt'], 900, None, False),
    # (hlo_bytes_fused dropped: byte_probe measured fused = 164.6 GB,
    # strictly dominated by tc = 97.3)
    # ----------------------------------------------------------------------
    ('bench', [PY, 'bench.py'], 600,
     {'FEMASR_BENCH_SKIP_PROBE': '1'}, False),
    ('batch2_full_enc', [PY, 'scripts/batch2_probe.py', '512',
                         '--segments', 'full,encoder'], 600, None, False),
    # 1. swin lever A/B (VERDICT #2: flip attn_pack default or delete it)
    ('pack2_full', [PY, 'scripts/perf_probe.py', '512', '1',
                    '--pack', '2'], 600, None, False),
    # 2. max-throughput datapoint (VERDICT #7: the only >bf16-ceiling lever)
    ('int8_everything', [PY, 'scripts/perf_probe.py', '512', '1', '--int8',
                         '--int8-levels', '3', '--int8-enc-up',
                         '--int8-swin'], 600, None, False),
    # 3. decoder-tail layout fix A/B (VERDICT #1a: make a FLOP reducer win)
    ('s2d_align8', [PY, 'scripts/perf_probe.py', '512', '1', '--s2d'],
     600, {'FEMASR_S2D_ALIGN': '8'}, False),
    # 4. first honest training-step number (VERDICT #4 done-criterion)
    ('train_chain8', [PY, 'scripts/train_step_probe.py', '--gt', '256',
                      '--batch', '8', '--dtype', 'bfloat16', '--chain', '8',
                      '--iters', '16'], 900, None, False),
    # 5. one-shot run of the NEW bench (chained lax.map variant): if the
    # degraded relay's loss vs round-2 (306.7 vs 224 ms on the identical
    # cached program) is per-dispatch overhead, chaining 8 tiles per
    # dispatch recovers most of it — the decisive experiment now that
    # pack2/int8/s2d all failed to beat plain bf16 wall-clock.
    ('bench_chain', [PY, 'bench.py'], 600,
     {'FEMASR_BENCH_SKIP_PROBE': '1'}, False),
    # 7+. attribution / diagnosis, in decreasing value
    ('pack2_noshift_full', [PY, 'scripts/perf_probe.py', '512', '1',
                            '--pack', '2', '--no-pack-shifted'], 600, None,
     False),
    ('batch2_swin_dec_vq', [PY, 'scripts/batch2_probe.py', '512',
                            '--segments', 'swin,decoder,vq'], 600, None,
     False),
    # all-cached bench rerun: now prints the TPU program's own
    # 'bytes accessed' (HBM-bound hypothesis test) + refreshes headline
    ('bench_bytes', [PY, 'bench.py'], 600,
     {'FEMASR_BENCH_SKIP_PROBE': '1'}, False),
    # device-data train step WITHOUT the on-device degradation pipeline:
    # isolates degradation's share of the 2%-MFU step (2.2 s/step).
    # First run (15:02) was contaminated by a co-running pytest (started
    # seconds after the phase launched — the guard only checks at phase
    # START); requeued, now also prints the step program's bytes accessed
    ('train_nodeg_dev2', [PY, 'scripts/train_step_probe.py', '--gt', '256',
                          '--batch', '8', '--dtype', 'bfloat16', '--chain',
                          '8', '--iters', '16', '--device-data',
                          '--no-degrade'], 600, None, False),
    # compile-only warm + byte-cost of the NEW train programs (post qkv
    # slicing + rbg degradation RNG). Co-runnable with pytest; warms the
    # chained-program cache the wall-clock phases below depend on. The
    # old program was 93.78 GB (cost_analysis) with ~66 GB of async swin
    # activation staging in the tool's accounting — the qkv fix kills
    # the [128,64,3,8,32] reshape family outright.
    ('train_bytes_new', [PY, 'scripts/train_step_probe.py', '--gt', '256',
                         '--batch', '8', '--dtype', 'bfloat16', '--chain',
                         '8', '--compile-only', '--dump-hlo',
                         '/tmp/hlo_tpu_train_b8_v2.txt'], 900, None, False),
    # winmajor swin layout on the train step (byte A/B, compile-only)
    ('train_bytes_winmajor', [PY, 'scripts/train_step_probe.py', '--gt',
                              '256', '--batch', '8', '--dtype', 'bfloat16',
                              '--compile-only'], 900,
     {'FEMASR_SWIN_LAYOUT': 'winmajor'}, False),
    # wall-clock of the NEW (chanraw+LNTPU+tc) step program WITH the
    # degradation pipeline: the 2224 ms/step 2%-MFU number was measured
    # on the old 590-GB-era code; the new program's roofline is 114.5 ms
    ('train_chain8_new', [PY, 'scripts/train_step_probe.py', '--gt', '256',
                          '--batch', '8', '--dtype', 'bfloat16', '--chain',
                          '8', '--iters', '16', '--device-data'], 700,
     None, False),
    # batch-1 train step: decisive test of the batch-interleave-layout
    # hypothesis for the 2%-MFU step (b2 serving showed 1.7-1.9x
    # per-pixel byte inflation at batch>=2; if b1 per-sample step time
    # is ~linear-better, conv layouts are the cause, else structural)
    ('train_b1', [PY, 'scripts/train_step_probe.py', '--gt', '256',
                  '--batch', '1', '--dtype', 'bfloat16', '--chain', '8',
                  '--iters', '16', '--device-data'], 700, None, False),
    # microbatched step (grad_accum_chunks=8): keeps conv batch at 1 inside
    # a b8 step — the designed fix if train_b1 confirms the batch-
    # interleave layout pathology. Byte A/B first (compile-only,
    # co-runnable), wall-clock after (cache then warm).
    # state round-trip probe: a donated TrainState->TrainState dispatch
    # with ~zero compute. If it costs ~seconds, the relay ships the full
    # optimizer state per execute call and the 2224 ms/step chained number
    # is dispatch overhead, not compute — the decisive discriminator for
    # the 2%-MFU question (compile is seconds; safe even degraded).
    ('train_state_probe', [PY, 'scripts/train_step_probe.py', '--gt', '256',
                           '--batch', '8', '--dtype', 'bfloat16',
                           '--state-probe'], 560, None, False),
    # batches generated INSIDE the scan body (zero H2D, no xs stacks):
    # state round-trip amortized 32-fold -> the honest device MFU number
    ('train_gen32', [PY, 'scripts/train_step_probe.py', '--gt', '256',
                     '--batch', '8', '--dtype', 'bfloat16', '--gen-chain',
                     '32', '--iters', '64'], 900, None, False),
    ('train_bytes_accum8', [PY, 'scripts/train_step_probe.py', '--gt',
                            '256', '--batch', '8', '--dtype', 'bfloat16',
                            '--chain', '8', '--accum', '8',
                            '--compile-only'], 900, None, False),
    ('train_accum8', [PY, 'scripts/train_step_probe.py', '--gt', '256',
                      '--batch', '8', '--dtype', 'bfloat16', '--chain', '8',
                      '--iters', '16', '--device-data', '--accum', '8'],
     700, None, False),
    # flat (raveled) Adam: kills the ~3.3K tiny per-tensor update/staging
    # instructions in the chained step program (CPU instr-count A/B runs
    # offline; this is the device wall-clock check)
    ('train_flat8', [PY, 'scripts/train_step_probe.py', '--gt', '256',
                     '--batch', '8', '--dtype', 'bfloat16', '--chain', '8',
                     '--iters', '16', '--device-data', '--flat-opt'],
     700, None, False),
    ('int8_conv', [PY, 'scripts/int8_conv_probe.py'], 560, None, False),
    # unchained-vs-chained per-step comparison (H2D story already
    # explained the 18 s anomaly; this is now low-priority attribution)
    ('train_chain1', [PY, 'scripts/train_step_probe.py', '--gt', '256',
                      '--batch', '8', '--dtype', 'bfloat16',
                      '--iters', '6'], 600, None, False),
    # (int8 sub-variant phases removed: int8_everything already measured
    # the combination LOSING by 6.6% — VERDICT #7 answered no-go;
    # pack_swin_seg removed: attn_pack contradiction closed in window 5)
    # (fused_full dropped: fused formulation byte-dominated by tc)
    # bench_warm repeats until the round ends so the LAST completed run
    # always left warm caches + a fresh honest number in the log
    ('bench_warm', [PY, 'bench.py'], 600,
     {'FEMASR_BENCH_SKIP_PROBE': '1'}, True),
]

PALLAS_CMD = [PY, '-c', (
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
    'print("PALLAS_EXEC_OK match:", (idx == ref).all())')]

PALLAS_PHASE = ('pallas_vq_compile', [PY, '-c', (
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
    'print("PALLAS_EXEC_OK match:", (idx == ref).all())')], 300, None,
    False)

# Round-4 tail: the bounded Pallas attempt (VERDICT r3 #4 — SINGLE
# attempt, 300 s cap, placed after the info-critical phases but hours
# before round end so a wedge can recover before the driver collects),
# then repeating cache-warm benches.
AGENDA_R4_DONE += [
    # r4_pallas_vq RETIRED: the (tn=1024) vq compile CRASHES the relay's
    # tpu_compile_helper (HTTP 500) and causes a multi-minute outage —
    # never re-queue it on this relay (NOTES_ROUND4.md session 3).
    # --- round-4 session-3: post-attribution agenda -----------------------
    # Bank real-hardware Pallas execution evidence (first exec of int8mm +
    # wattn happened interactively 2026-08-19 ~08:00; this re-banks it in
    # bench_evidence/pallas_exec_r4.txt and adds the fixed int8conv).
    ('r4b_pallas_exec', [PY, 'scripts/pallas_exec_probe.py',
                         '--kernels', 'int8mm,wattn,int8conv,vq_tiny'],
     900, None, False),
    # Pallas fused window-attention serving A/B (kernel compiled AND
    # executed on hardware 2026-08-19): the copy attribution puts ~270+ MB
    # of staging/logits traffic per swin block that the kernel keeps in
    # VMEM. hlo first (byte count + warms the program compile cache),
    # then wall-clock.
    ('r4b_hlo_pallas_attn', [PY, 'scripts/hlo_bytes.py', '512',
                             '--top', '15'], 880,
     {'FEMASR_ATTN': 'pallas'}, False),
    ('r4b_bench_pallas_attn', [PY, 'bench.py'], 880,
     {'FEMASR_BENCH_SKIP_PROBE': '1', 'FEMASR_ATTN': 'pallas',
      'FEMASR_BENCH_TILES': '512'}, False),
    # Compile-only phases FIRST (hlo_bytes_ prefix = may co-run with the
    # pytest suite; the wall-clock phases below defer until pytest ends).
    # batch-layout pathology minimal repro (VERDICT r3 #5): compile-only
    # b1 / b2 / b2-folded-into-height conv byte ratios + layout evidence.
    ('hlo_bytes_blayout', [PY, 'scripts/xla_batch_layout_repro.py'],
     700, None, False),
    # composite-block layout repro round 2: the conv->GN->silu->conv block
    # reproduces the b2 pathology even on CPU (1.81x per-pixel) and the
    # height-fold sidesteps it (1.20x) — confirm magnitudes on the chip.
    ('hlo_bytes_blayout2', [PY, 'scripts/xla_batch_layout_repro.py'],
     700, None, False),
    # VQ bisect RETIRED after one decisive case (10:22 UTC): vq at
    # (tn=1024, K=128) CRASHES the relay's tpu_compile_helper (HTTP 500,
    # subprocess exit 1) and takes the relay down for minutes — the
    # round-2..4 "stall" is a shape-dependent Mosaic compiler crash
    # triggered by the token-tile axis, NOT by codebook size. Each retry
    # costs a relay outage, so further shapes are a non-relay-hardware
    # deliverable (NOTES_ROUND4.md / FORMULATIONS.md).
    # Harness-contradiction discriminators (105 ms seg-full vs 1608 ms
    # gen-chain32 on ~the same b8 program; NOTES_ROUND4.md): chain length,
    # then donation, then the deg-in-step interaction.
    ('r4b_seg_full_k32', [PY, 'scripts/train_segment_probe.py',
                          '--segments', 'full', '--chain', '32'],
     880, None, False),
    # SAME-WINDOW chain-length pairing: k8 measured 105 ms (05:35, healthy)
    # and k32 measured 2404 ms (11:50, right after a 80-min wedge) — the
    # pairing deconfounds chain length from chip state.
    ('r4b_seg_full_k8_k32', [PY, 'scripts/train_segment_probe.py',
                             '--segments', 'full', '--chains', '8,32',
                             '--dispatches', '2'], 880, None, False),
    # vq_tiny re-run with the tie-aware check (first attempt EXECUTED on
    # chip, 1/128 flip = f32 near-tie between the kernel's c^2-2zc MXU
    # form and the reference's (z-c)^2 sum)
    ('r4c_vq_exec_tie', [PY, 'scripts/pallas_exec_probe.py',
                         '--kernels', 'vq_tiny'], 400, None, False),
    # gen32_nodeg2 / k32_don / degfull DROPPED 12:57 UTC: the same-
    # window k8/k32 pairing proved relay-state variance (8331 vs 630
    # ms/step in 3 min) swamps any program-level difference these
    # would measure; remaining windows go to serving A/Bs + bench.
]

# --- ROUND-4 CLOSE-OUT agenda (2026-08-19 session 4) --------------------
# The container restarted: /tmp (watchdog state) AND the persistent
# compile cache (~/.cache/femasr_tpu/jax_cache) were wiped. Everything in
# AGENDA_R4_DONE already produced its number (NOTES_ROUND4.md); what
# remains is (1) rebuilding the ladder caches RUNG-BY-RUNG — a single
# cold 600 s full-bench is exactly the round-3 weak-#4 failure mode
# (fresh compiles 2-4 min each when degraded) — then banking the driver
# bench, then (2) the still-unrun int8 serving A/Bs (the only identified
# lever past the ~2.1 MP/s byte roofline), then (3) the TPU composite
# batch-layout magnitudes (compile-only), then repeating bench_warm.
AGENDA_R4B_DONE = [
    ('r4d_warm512', [PY, 'bench.py'], 880,
     {'FEMASR_BENCH_SKIP_PROBE': '1', 'FEMASR_BENCH_TILES': '512',
      'FEMASR_BENCH_BUDGET_S': '840'}, False),
    ('r4d_warm256', [PY, 'bench.py'], 880,
     {'FEMASR_BENCH_SKIP_PROBE': '1', 'FEMASR_BENCH_TILES': '256',
      'FEMASR_BENCH_BUDGET_S': '840'}, False),
    ('r4d_warm128', [PY, 'bench.py'], 880,
     {'FEMASR_BENCH_SKIP_PROBE': '1', 'FEMASR_BENCH_TILES': '128',
      'FEMASR_BENCH_BUDGET_S': '840'}, False),
    ('r4d_bench', [PY, 'bench.py'], 600,
     {'FEMASR_BENCH_SKIP_PROBE': '1'}, False),
    # int8 serving wall-clock with the FUSED Pallas backend (round-3's
    # XLA int8 measured -6.6% from dequant HBM passes; the fused kernels
    # are hardware-validated bitwise vs XLA int8). Same config as the
    # round-3 int8_everything phase for comparability. Tail-only first:
    # smaller program, cheaper compile, quality-gated subset.
    ('r4c_int8_tail_pallas', [PY, 'scripts/perf_probe.py', '512', '1',
                              '--int8', '--int8-levels', '2'], 880,
     {'FEMASR_INT8_BACKEND': 'pallas'}, False),
    ('r4c_int8_pallas', [PY, 'scripts/perf_probe.py', '512', '1', '--int8',
                         '--int8-levels', '3', '--int8-swin',
                         '--int8-enc-up'], 880,
     {'FEMASR_INT8_BACKEND': 'pallas'}, False),
    # composite-block layout repro round 2: the conv->GN->silu->conv block
    # reproduces the b2 pathology even on CPU (1.81x per-pixel) and the
    # height-fold sidesteps it (1.20x) — confirm magnitudes on the chip.
    ('hlo_bytes_blayout2', [PY, 'scripts/xla_batch_layout_repro.py'],
     700, None, False),
    # --- per-token int8 CHAIN validation ladder (built 2026-08-19 session
    # 4 after the per-tensor int8 A/B measured a byte BLOWUP; see
    # NOTES_ROUND4.md): (1) Mosaic AOT compile of the two chain kernels,
    # (2) compile-only byte probes of the full 512px program — the chain
    # is only worth a wall-clock attempt if bytes land UNDER the 97.3 GB
    # bf16 baseline, (3) bounded wall-clocks for both backends.
    # Reordered 2026-08-20 (session 5, short close-out window): the XLA
    # byte probe is the DECISIVE gate for the whole chain idea (if the
    # chain's program bytes land >= 97.3 GB even the XLA variant is
    # dead), it is crash-safe (no tpu_custom_call), and it may co-run
    # with pytest — so it goes first. The Mosaic ktest (fc1 carries the
    # VQ-crash-like shape signature; fc2 is the simple one) and the
    # pallas phases follow only once the XLA evidence is banked.
    ('hlo_bytes_int8mlp_xla', [PY, 'scripts/perf_probe.py', '512', '1',
                               '--int8-mlp', '--compile-only'], 700,
     None, False),
    ('r4e_int8mlp_xla', [PY, 'scripts/perf_probe.py', '512', '1',
                         '--int8-mlp'], 880, None, False),
    ('int8mlp_ktest', [PY, 'scripts/pallas_compile_probe.py',
                       '--kernels', 'int8mmq_fc2,int8mmq_fc1,'
                       'int8mmq_fc1_tm64',
                       '--timeout', '120'], 500, None, False),
    ('hlo_bytes_int8mlp_pl', [PY, 'scripts/perf_probe.py', '512', '1',
                              '--int8-mlp', '--compile-only'], 700,
     {'FEMASR_INT8_BACKEND': 'pallas'}, False),
    ('r4e_int8mlp_pl', [PY, 'scripts/perf_probe.py', '512', '1',
                        '--int8-mlp'], 880,
     {'FEMASR_INT8_BACKEND': 'pallas'}, False),
]

# --- ROUND-5 agenda (2026-08-20) ----------------------------------------
# VERDICT r4 next #3 (roofline-gap segment attribution) and #4 (the
# varied-input training-claim discriminator), then repeating bench_warm
# to hold the ladder caches through driver collection. Prefix probes
# compile one big 512px program variant per stage (2-4 min each when the
# relay is degraded), so they are split across phases; each phase's
# compiles land in the persistent cache, making retries cheap.
AGENDA = [
    # VERDICT #3: wall-delta vs byte-delta per cumulative prefix of the
    # serving forward decides dispatch-overhead vs below-bandwidth
    # segment. Stages split 2-3 per phase to fit degraded compiles.
    # v2 2026-08-20 06:40: r5_prefix_enc exposed two probe bugs (a /K on
    # scan-body-once cost_analysis, and DCE of not-yet-consumed encoder
    # heads making deltas non-monotone); v2 re-runs all stages with the
    # fixed script (live-set checksums + no /K). The buggy run still
    # bounded the story: encoder-with-all-heads = 91.3 ms of the 157 ms
    # tile at ~63.5 GB of the 97.3 GB program.
    ('r5p2_prefix_enc', [PY, 'scripts/serve_prefix_probe.py', '512',
                         '--stages', 'enc,vq'], 880, None, False),
    ('r5p2_prefix_mid', [PY, 'scripts/serve_prefix_probe.py', '512',
                         '--stages', 'aq,dec0'], 880, None, False),
    ('r5p2_prefix_tail', [PY, 'scripts/serve_prefix_probe.py', '512',
                          '--stages', 'dec1,dec2,full'], 880, None, False),
    # VERDICT #4: the 105 ms b8 G+D claim vs the gen-chain 1608 ms — the
    # segment probe folds a distinct `base` scalar into every dispatch
    # (value-cache-proof); pair it with a gen-chain run in the SAME
    # window. If ~105 ms survives, the README claim stands; if not, the
    # honest number changes.
    ('r5_train_varied', [PY, 'scripts/train_segment_probe.py',
                         '--segments', 'full', '--chain', '8',
                         '--dispatches', '3'], 880, None, False),
    ('r5_train_gen8', [PY, 'scripts/train_step_probe.py',
                       '--gen-chain', '8', '--no-degrade',
                       '--iters', '3'], 880, None, False),
    # VERDICT #1: full materialized-copy + slice ranking (compile-only,
    # may co-run with pytest) — the 12.91 GB lever's class tail.
    ('hlo_bytes_copyfull', [PY, 'scripts/hlo_bytes.py', '512', '1',
                            '--opcode', 'copy', '--top', '100'],
     700, None, False),
    ('hlo_bytes_slicefull', [PY, 'scripts/hlo_bytes.py', '512', '1',
                             '--opcode', 'slice', '--top', '40'],
     700, None, False),
    # r5_s2d_wall REMOVED 2026-08-20 09:40: the compile-only padding-tax
    # A/B already decides it — s2d fixes dec2's lane pad (14.56→7.66 GB
    # waste) but the pad+phase-slice idiom regresses LOGICAL bytes
    # 97.29→130.0 GB (align=1) / 129.1 (align=8): physical ~155 GB vs
    # the baseline's 128.7. Loser before wall-clocking (FORMULATIONS.md).
    # ONE bounded attempt (the 'pallas' name caps attempts at 1) at the
    # REFORMULATED VQ kernel: argmin replaced by two plain reduces
    # (min-distance, then min of masked iota) — the variadic
    # (value,index) reduce was the narrowed Mosaic crash signature while
    # the fc1 kernel's plain 1024-lane reduce PASSes at this geometry.
    # Interpret-parity green on CPU (tests/test_pallas_vq.py, incl.
    # tie-breaking). Placed after every decision-critical phase: a crash
    # still costs a multi-minute relay outage.
    # ws2d decoder tail (round-5 kernel, ops/pallas/ws2d_conv.py): the
    # ONLY formulation left that can touch the 14.56 GB dec2 padding
    # waste (every XLA-level variant measured a loser). Ladder:
    # standalone Mosaic compile check -> full-program byte/pad report
    # (also warms the persistent cache) -> tiny on-chip exec parity ->
    # bounded wall-clock A/B. Decision-critical: runs before r5p3.
    ('ws2d_ktest', [PY, 'scripts/pallas_compile_probe.py', '--kernels',
                    'ws2dconv,ws2dout,ws2dconv_th4', '--timeout', '120'],
     500, None, False),
    # the packed-edge 6-dot form (now the model-shape default) vs the
    # 9-dot insurance case — fresh Mosaic validation after the kernel
    # rewrite
    ('ws2d_ktest6', [PY, 'scripts/pallas_compile_probe.py', '--kernels',
                     'ws2dconv,ws2dout,ws2dconv_d9', '--timeout', '120'],
     500, None, False),
    # compile-only byte/pad reports for the three ws2d configs (tail /
    # +dec1 chained / +encoder-up) — these also warm the persistent
    # compile cache so the wall A/Bs spend their windows executing
    ('hlo_bytes_ws2d', [PY, 'scripts/hlo_bytes.py', '512', '1', '--ws2d',
                        '--opcode', 'copy', '--top', '8'], 700, None,
     False),
    ('hlo_bytes_ws2dl2', [PY, 'scripts/hlo_bytes.py', '512', '1',
                          '--ws2d', '--ws2d-levels', '2', '--opcode',
                          'copy', '--top', '8'], 700, None, False),
    ('hlo_bytes_ws2dl2e', [PY, 'scripts/hlo_bytes.py', '512', '1',
                           '--ws2d', '--ws2d-levels', '2',
                           '--ws2d-enc-up', '--opcode', 'copy', '--top',
                           '8'], 700, None, False),
    # tiny on-chip exec parity, then the ONE wall A/B that matters:
    # the byte reports decided the config — ws2d_levels=1 compiles at
    # 92.90 GB logical / ~110.8 physical, while levels=2 (115.35 GB)
    # and levels=2+enc_up (114.20 GB) REGRESS ~25 GB of encoder/
    # no-metadata padding waste under this XLA's layout assignment
    # (deeper ws2d chains propagate layouts badly; archived in
    # FORMULATIONS.md — their wall phases were dropped, don't re-add).
    ('r5_ws2d_exec', [PY, 'scripts/pallas_exec_probe.py', '--kernels',
                      'ws2dconv', '--timeout', '240'], 400, None, False),
    ('r5_ws2d_wall', [PY, 'scripts/perf_probe.py', '512', '1', '--ws2d'],
     880, None, False),
    # masked-edge 6-dot kernel (now the model-shape default after its
    # Mosaic PASS): the 9-dot wall measured 172.5 ms (1.519 MP/s) —
    # byte win eaten by the 2x MAC overhead; the 6-dot form cuts kernel
    # MACs to 1.33x HR. Fresh exec parity then the wall A/B; th=8
    # variant probes the VMEM-budget choice (est. 11.3M vs the 16M
    # Mosaic limit; th=4 shipped default).
    ('r5_ws2d_exec6', [PY, 'scripts/pallas_exec_probe.py', '--kernels',
                       'ws2dconv', '--timeout', '240'], 400, None,
     False),
    ('r5_ws2d_wall6', [PY, 'scripts/perf_probe.py', '512', '1',
                       '--ws2d'], 880, None, False),
    ('r5_ws2d_wall6_th8', [PY, 'scripts/perf_probe.py', '512', '1',
                           '--ws2d'], 880,
     {'FEMASR_WS2D_TH': '8'}, False),
    # standalone tail A/B at the real shape: per-variant wall of JUST
    # decoder_group_2 + out_conv (full-program proxy puts ws2d at
    # 165.9 vs ~159.8 baseline; this attributes the kernel-vs-XLA
    # per-conv difference directly and decides whether GN-prologue +
    # DMA double-buffering can flip the sign)
    ('r5_tail_ab', [PY, 'scripts/tail_layout_probe.py', '--variants',
                    'nhwc,ws2d', '--wall'], 880,
     {'FEMASR_WS2D_TH': '8'}, False),
    # SAME-WINDOW full-program A/B (the 165.9-vs-159.8 comparison spans
    # windows with +-4 ms variance, while the same-window tail A/B has
    # ws2d 4.7 ms AHEAD — this settles the default flip). Caches warm.
    ('r5_ab_samewin', ['bash', '-lc',
                       f'timeout 400 {PY} scripts/perf_probe.py 512 1 && '
                       f'FEMASR_WS2D_TH=8 timeout 400 {PY} '
                       'scripts/perf_probe.py 512 1 --ws2d'], 860, None,
     False),
    # same-window A/B of the fused-GN-prologue ws2d program (the
    # r5_ab_samewin run measured the UNFUSED kernel: 158.8 vs 167.1 —
    # the fused program saves ~4.3 GB logical + one HBM pass per conv)
    ('r5_ab_samewin_fused', ['bash', '-lc',
                             f'timeout 400 {PY} scripts/perf_probe.py '
                             '512 1 && FEMASR_WS2D_TH=8 timeout 400 '
                             f'{PY} scripts/perf_probe.py 512 1 --ws2d'],
     860, None, False),
    # + double-buffered window DMA (fused A/B measured 158.9 vs 162.3;
    # the serialized per-strip DMA is the last identified overhead).
    # Exec parity first (the db path changed the DMA structure).
    ('r5_ws2d_exec_db', [PY, 'scripts/pallas_exec_probe.py', '--kernels',
                         'ws2dconv', '--timeout', '240'], 400, None,
     False),
    # NOTE: th=8 + double-buffer OOMs scoped VMEM (18.41M vs 16M, first
    # r5_ab_samewin_db attempt) — the budget is db-aware now; let th
    # auto-select (4).
    ('r5_ab_samewin_db2', ['bash', '-lc',
                           f'timeout 400 {PY} scripts/perf_probe.py '
                           '512 1 && timeout 400 '
                           f'{PY} scripts/perf_probe.py 512 1 --ws2d'],
     860, None, False),
    # intra-encoder attribution (r5p2 left ~14 ms of the encoder's 91.4 ms
    # unattributed above its 77.6 ms roofline): in_conv+down / swin group
    # prefixes / first up block. Each compiles a fresh big program —
    # split 2 per phase for degraded windows. BEFORE the VQ probe (a
    # Mosaic crash costs a multi-minute outage — run it dead last).
    ('r5p3_enc_a', [PY, 'scripts/serve_prefix_probe.py', '512',
                    '--stages', 'down,swin2'], 880, None, False),
    ('r5p3_enc_b', [PY, 'scripts/serve_prefix_probe.py', '512',
                    '--stages', 'swin4,up0'], 880, None, False),
    ('r5_vq_minmask_pallas_probe', [PY, 'scripts/pallas_compile_probe.py',
                                    '--kernels', 'vq', '--timeout', '120'],
     400, None, False),
    # one-shot warms of the FALLBACK rungs for the new ws2d default
    # program (the warm-cache descending ladder stops at the 512
    # success, so these never compile through bench_warm cycles; a
    # driver capture in a degraded window needs them cached)
    ('bench_warm256_ws2d', [PY, 'bench.py'], 700,
     {'FEMASR_BENCH_SKIP_PROBE': '1', 'FEMASR_BENCH_TILES': '256'},
     False),
    ('bench_warm128_ws2d', [PY, 'bench.py'], 700,
     {'FEMASR_BENCH_SKIP_PROBE': '1', 'FEMASR_BENCH_TILES': '128'},
     False),
    ('bench_warm', [PY, 'bench.py'], 600,
     {'FEMASR_BENCH_SKIP_PROBE': '1'}, True),
]


def load_state():
    try:
        with open(STATE_FILE) as f:
            st = json.load(f)
            st.setdefault('attempts', {})
            return st
    except Exception:
        return {'done': [], 'results': [], 'attempts': {}}


def save_state(state):
    with open(STATE_FILE, 'w') as f:
        json.dump(state, f, indent=1)


def pytest_running():
    """True when the CPU test suite is active (read-only process scan —
    never kills by pattern). Factored out so the queue-logic test, which
    itself runs under pytest, can stub it."""
    try:
        busy = subprocess.run(['pgrep', '-c', '-f', 'pytest'],
                              capture_output=True, text=True).stdout.strip()
        return bool(busy) and int(busy) > 0
    except Exception:
        return False


def probe(timeout_s=90):
    """Varied-value health probe (defeats the relay's identical-dispatch
    value cache). TERM on timeout, never SIGKILL-first."""
    salt = int(time.time()) % 9973
    p = subprocess.Popen(
        [PY, '-c', f'import jax, jax.numpy as jnp; '
         f'print("HOK", float(jnp.arange({salt}.0, {salt}.0 + 4).sum()))'],
        cwd=HERE, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True)
    try:
        out = p.communicate(timeout=timeout_s)[0]
        return p.returncode == 0 and 'HOK' in out
    except subprocess.TimeoutExpired:
        p.terminate()
        try:
            p.communicate(timeout=20)
        except subprocess.TimeoutExpired:
            p.kill()
            p.communicate()
        return False


def run_phase(name, cmd, budget_s, env_extra):
    print(f'\n===== {name} (budget {budget_s}s) {time.strftime("%H:%M:%S")}',
          flush=True)
    env = dict(os.environ)
    env.pop('JAX_PLATFORMS', None)
    if env_extra:
        env.update(env_extra)
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
    print(out, flush=True)
    print(f'----- {name}: {"OK" if ok else "FAILED"}', flush=True)
    return ok, out


def main():
    budget = float(os.environ.get('RELAY_WATCHDOG_BUDGET_S', 21600))
    # healthy windows last ~5 min (round-3 flapping log): a 10-min probe
    # cadence misses most of them. 240 s sleep + 90 s probe ≈ 5.5 min cycle.
    sleep_s = float(os.environ.get('RELAY_WATCHDOG_SLEEP_S', 240))
    include_pallas = os.environ.get('RELAY_WATCHDOG_PALLAS', '0') == '1'
    t0 = time.time()
    state = load_state()

    agenda = list(AGENDA)
    if include_pallas:
        agenda.append(PALLAS_PHASE[:3] + (PALLAS_PHASE[3],
                                          PALLAS_PHASE[4]))

    MAX_ATTEMPTS = 3

    def attempts_cap(name):
        # the Pallas probe gets exactly ONE attempt (round-2 precedent:
        # a TERM'd in-flight tpu_custom_call compile preceded multi-hour
        # relay outages; retrying multiplies the wedge risk for zero
        # extra information). Exception: the int8 serving A/Bs route
        # through kernels whose relay-side Mosaic compile is VALIDATED
        # (pallas_compile_probe PASS + on-chip exec, session 2/3), so a
        # flap-killed attempt may retry once off the persistent cache.
        if 'int8' in name:
            return 2
        return 1 if 'pallas' in name else MAX_ATTEMPTS

    # End-of-round freeze policy (VERDICT r3 weak#8, now formal): in the
    # last FREEZE_S of the watchdog budget, no NEW experiment phases
    # start — only the repeatable cache-keeping bench phases — so the
    # driver's end-of-round collection never finds a cold cache or an
    # in-flight risky program.
    freeze_s = min(float(os.environ.get('RELAY_WATCHDOG_FREEZE_S', 3600)),
                   0.25 * budget)

    while time.time() - t0 < budget:
        pending = [ph for ph in agenda
                   if ph[4] or (ph[0] not in state['done']
                                and state['attempts'].get(ph[0], 0)
                                < attempts_cap(ph[0]))]
        if budget - (time.time() - t0) < freeze_s:
            frozen = [ph[0] for ph in pending if not ph[4]]
            pending = [ph for ph in pending if ph[4]]
            if frozen:
                print(f'[{time.strftime("%H:%M:%S")}] FREEZE window: '
                      f'deferring {frozen} permanently; bench-warm only',
                      flush=True)
        if not pending:
            print('agenda complete', flush=True)
            return
        # never co-run TPU wall-clock measurements with the CPU test
        # suite (CLAUDE.md: 5x distortion measured on the 1-core
        # container). Compile-only byte probes (gn_ab*, hlo_bytes*,
        # train_bytes) report the compiled program's 'bytes accessed' —
        # contention only slows the compile, so they may co-run.
        compile_only = pending[0][0].startswith(
            ('gn_ab', 'hlo_bytes', 'train_bytes'))
        if pytest_running() and not compile_only:
            print(f'[{time.strftime("%H:%M:%S")}] pytest running; '
                  'deferring TPU phases 120s', flush=True)
            time.sleep(120)
            continue
        if not probe():
            print(f'[{time.strftime("%H:%M:%S")}] relay down; sleeping '
                  f'{sleep_s:.0f}s', flush=True)
            time.sleep(sleep_s)
            continue
        print(f'[{time.strftime("%H:%M:%S")}] relay HEALTHY; running '
              f'{pending[0][0]}', flush=True)
        name, cmd, b, env_extra, repeat = pending[0]
        state['attempts'][name] = state['attempts'].get(name, 0) + 1
        ok, out = run_phase(name, cmd, b, env_extra)
        state['results'].append({'name': name, 'ok': ok, 'ts':
                                 time.strftime('%H:%M:%S'),
                                 'tail': out[-1500:]})
        if ok and not repeat:
            state['done'].append(name)
        if ok and repeat:
            # bench_warm: space repeats out so the loop doesn't hammer
            save_state(state)
            time.sleep(max(sleep_s, 900))
            continue
        save_state(state)
        if not ok and out.endswith('>>'):
            # slow compile or mid-phase relay death; cool down either way
            print('cooling down 180s after phase timeout', flush=True)
            time.sleep(180)

    print('watchdog budget exhausted', flush=True)


if __name__ == '__main__':
    main()
