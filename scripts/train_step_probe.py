#!/usr/bin/env python
"""Training-step throughput probe (LQ stage, on-device degradation).

Measures steps/s of the single jitted G+D train step at a given gt size /
batch / compute dtype on the live chip, with the relay-honest methodology.

Usage: timeout 580 python scripts/train_step_probe.py [--gt 256] [--batch 8]
           [--dtype float32|bfloat16] [--iters 6] [--hq]
"""
import argparse
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def _entry_instrs(compiled):
    """Entry-computation instruction count — the A/B currency for
    serialization-overhead levers (flat_optimizer, rbg degradation RNG):
    the round-3 train dump ran 19x its HBM roofline with ~23K entry
    instructions, so instruction count is a first-class suspect."""
    n, in_entry = 0, False
    for line in compiled.as_text().splitlines():
        if line.startswith('ENTRY'):
            in_entry = True
        elif in_entry:
            if line.startswith('}'):
                break
            if ' = ' in line:
                n += 1
    return n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--gt', type=int, default=256)
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--dtype', default='float32')
    ap.add_argument('--iters', type=int, default=6)
    ap.add_argument('--hq', action='store_true',
                    help='HQ pretrain stage instead of LQ')
    ap.add_argument('--sync_every_step', action='store_true',
                    help='fetch the loss dict every step (print_freq=1 '
                         'behavior) instead of once at the end')
    ap.add_argument('--chain', type=int, default=0,
                    help='>1: run K steps per dispatch via lax.scan '
                         '(optimize_parameters_chained) — amortizes the '
                         'relay per-dispatch argument round-trip')
    ap.add_argument('--device-data', action='store_true',
                    help='synthesize batches ON DEVICE (jax.random) — '
                         'isolates relay H2D bandwidth from step compute '
                         '(the 18 s/step train_chain8 anomaly suspect)')
    ap.add_argument('--h2d', action='store_true',
                    help='measure raw host->device bandwidth first')
    ap.add_argument('--no-degrade', action='store_true',
                    help='feed precomputed lq instead of the on-device '
                         'BSRGAN pipeline — isolates the degradation '
                         'share of the step cost')
    ap.add_argument('--dump-hlo', default=None,
                    help='write the single-step program HLO here (for '
                         'scripts/hlo_bytes.py offline attribution)')
    ap.add_argument('--accum', type=int, default=1,
                    help='grad_accum_chunks: microbatched G/D step '
                         '(batch-1 conv layouts when == batch)')
    ap.add_argument('--flat-opt', action='store_true',
                    help='flat_optimizer: one raveled Adam vector per '
                         'moment instead of ~400 per-tensor chains')
    ap.add_argument('--state-probe', action='store_true',
                    help='time a trivial donated state->state dispatch '
                         '(step+1 only): isolates the relay per-dispatch '
                         'TrainState round-trip from step compute')
    ap.add_argument('--gen-chain', type=int, default=0,
                    help='>1: K steps per dispatch with batches GENERATED '
                         'inside the scan body (zero H2D, zero xs stacks) '
                         '— the state round-trip amortizes K-fold; the '
                         'honest device MFU number on this relay')
    ap.add_argument('--compile-only', action='store_true',
                    help='compile + cost-report the step program, no '
                         'execution (safe on a flapping relay once the '
                         'compile cache is warm)')
    args = ap.parse_args()

    import jax
    cache_dir = os.path.expanduser('~/.cache/femasr_tpu/jax_cache')
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
    import numpy as np

    from femasr_tpu.train import build_model
    from femasr_tpu.utils.checkpoint import save_pytree, to_host
    from femasr_tpu.utils.options import yaml_load

    tmp = '/tmp/femasr_step_probe'
    os.makedirs(f'{tmp}/models', exist_ok=True)

    def make_opt(name, lq_stage):
        opt = yaml_load(f"""
name: {name}
model_type: FeMaSRModel
scale: 4
num_gpu: 1
manual_seed: 0
is_train: true
dist: false
rank: 0
world_size: 1
datasets:
  train:
    phase: train
    scale: 4
    gt_size: {args.gt}
    on_device_degradation: {str(not args.hq and not args.no_degrade).lower()}
network_g:
  type: FeMaSRNet
  gt_resolution: 256
  norm_type: 'gn'
  act_type: 'silu'
  dtype: {args.dtype}
  codebook_params:
    - [32, 1024, 512]
  LQ_stage: {str(lq_stage).lower()}
  scale_factor: 4
network_d: {{type: UNetDiscriminatorSN, num_in_ch: 3, dtype: {args.dtype}}}
path: {{strict_load: false}}
train:
  optim_g: {{type: Adam, lr: !!float 1e-4, weight_decay: 0, betas: [0.9, 0.99]}}
  optim_d: {{type: Adam, lr: !!float 4e-4, weight_decay: 0, betas: [0.9, 0.99]}}
  scheduler: {{type: MultiStepLR, milestones: [50000], gamma: 1}}
  total_iter: 100
  warmup_iter: -1
  pixel_opt: {{type: L1Loss, loss_weight: 1.0, reduction: mean}}
  gan_opt: {{type: GANLoss, gan_type: hinge, real_label_val: 1.0,
            fake_label_val: 0.0, loss_weight: 0.1}}
  codebook_opt: {{loss_weight: 1.0}}
  net_d_iters: 1
  net_d_init_iters: !!float 0
val: {{val_freq: 1e9, metrics: {{psnr: {{type: psnr}}}}}}
logger: {{print_freq: 1, use_tb_logger: false}}
""")
        if lq_stage:
            opt['network_g']['frozen_module_keywords'] = [
                'quantize', 'decoder', 'after_quant_group', 'out_conv']
            opt['path']['pretrain_network_hq'] = f'{tmp}/models/hq.ckpt'
        opt['path']['models'] = f'{tmp}/models'
        opt['path']['training_states'] = f'{tmp}/states'
        opt['path']['visualization'] = f'{tmp}/vis'
        opt['train']['grad_accum_chunks'] = args.accum
        opt['train']['flat_optimizer'] = args.flat_opt
        return opt

    if not args.hq:
        hq = build_model(make_opt('probe_hq_init', False))
        save_pytree({'params': to_host(hq.state.params_g)},
                    f'{tmp}/models/hq.ckpt')
        del hq

    model = build_model(make_opt('probe', not args.hq))
    rng = np.random.default_rng(0)
    gt = args.gt
    lq = gt // 4

    if args.h2d:
        # raw H2D bandwidth through the relay (sync by fetching a scalar
        # reduction — block_until_ready does not sync on this relay)
        import jax.numpy as jnp
        for mb in (1, 6, 50):
            h = rng.random((max(1, mb * 250000),), np.float32)
            t0 = time.perf_counter()
            x = jax.device_put(h)
            _ = float(jnp.sum(x))  # rng advances per size: values differ,
            dt = time.perf_counter() - t0  # so the relay value cache misses
            print(f'h2d {h.nbytes / 1e6:.0f} MB: {dt:.2f}s -> '
                  f'{h.nbytes / dt / 1e6:.1f} MB/s', flush=True)

    if args.device_data:
        import jax.numpy as jnp

        def batch(i):
            k = jax.random.PRNGKey(i)
            return {'lq': jax.random.uniform(
                        jax.random.fold_in(k, 1),
                        (args.batch, lq, lq, 3), jnp.float32),
                    'gt': jax.random.uniform(
                        jax.random.fold_in(k, 2),
                        (args.batch, gt, gt, 3), jnp.float32)}
    else:
        def batch(i):
            return {'lq': rng.random((args.batch, lq, lq, 3), np.float32),
                    'gt': rng.random((args.batch, gt, gt, 3), np.float32)}

    stage = 'HQ' if args.hq else (
        'LQ-fedlq' if args.no_degrade else 'LQ-ondevice')
    if args.device_data:
        stage += ' device-data'

    if args.state_probe:
        # decisive cheap test of the state-round-trip hypothesis for the
        # 2%-MFU chained step (NOTES_ROUND3.md window 4): a donated
        # TrainState -> TrainState dispatch with ~zero compute. If this
        # costs ~seconds, the relay ships the full optimizer state per
        # execute call and per-dispatch overhead — not step compute — is
        # the wall-clock; the fix is amortization (large --gen-chain K).
        import jax
        nbytes = sum(a.nbytes for a in jax.tree.leaves(model.state)) / 1e9
        bump = jax.jit(lambda st: st.replace(step=st.step + 1),
                       donate_argnums=(0,))
        t0 = time.perf_counter()
        st = bump(model.state)
        _ = int(jax.device_get(st.step))   # host fetch = real sync here
        print(f'state-probe compile+1: {time.perf_counter() - t0:.2f}s '
              f'(state {nbytes:.2f} GB)', flush=True)
        for i in range(4):
            t0 = time.perf_counter()
            st = bump(st)
            _ = int(jax.device_get(st.step))
            print(f'state-probe dispatch {i}: '
                  f'{time.perf_counter() - t0:.3f}s', flush=True)
        model.state = st
        return

    if args.gen_chain > 1:
        # K steps per dispatch with the batches synthesized INSIDE the
        # scan body (jax.random keyed off the scan index + a per-dispatch
        # base so the relay's identical-dispatch value cache misses):
        # no xs stacks, no H2D, state round-trip amortized K-fold — the
        # honest device-compute number for the G+D step.
        import jax
        import jax.numpy as jnp
        K = args.gen_chain
        B = args.batch
        inner = model._train_step   # jitted; inlines when traced

        def gen_chain(state, params_hq, base):
            def body(st, i):
                kk = jax.random.fold_in(jax.random.PRNGKey(7), base + i)
                lq_a = jax.random.uniform(jax.random.fold_in(kk, 1),
                                          (B, lq, lq, 3), jnp.float32)
                gt_a = jax.random.uniform(jax.random.fold_in(kk, 2),
                                          (B, gt, gt, 3), jnp.float32)
                st, loss_dict, _ = inner(st, lq_a, gt_a, params_hq)
                return st, loss_dict['l_g_total']
            return jax.lax.scan(body, state, jnp.arange(K))

        f = jax.jit(gen_chain, donate_argnums=(0,))
        t0 = time.perf_counter()
        st, ls = f(model.state, model.params_hq, jnp.int32(0))
        l_last = float(ls[-1])
        print(f'gen-chain{K} compile+1: {time.perf_counter() - t0:.1f}s '
              f'l_g_total={l_last:.3f}', flush=True)
        n_disp = max(1, args.iters // K)
        t0 = time.perf_counter()
        for d in range(n_disp):
            st, ls = f(st, model.params_hq, jnp.int32((d + 1) * K))
            l_last = float(ls[-1])   # host fetch syncs the dispatch
        dt = (time.perf_counter() - t0) / (n_disp * K)
        model.state = st
        msg = (f'{stage} gt={gt} batch={B} dtype={args.dtype} '
               f'gen-chain={K}: {dt * 1e3:.0f} ms/step -> {B / dt:.2f} '
               f'img/s')
        try:
            lq_a = jnp.zeros((B, lq, lq, 3), jnp.float32)
            gt_a = jnp.zeros((B, gt, gt, 3), jnp.float32)
            ca = model._train_step.lower(
                st, lq_a, gt_a, model.params_hq).compile().cost_analysis()
            if ca and 'flops' in ca:
                fl = float(ca['flops'])
                msg += (f', {fl / 1e12:.2f} TFLOP/step -> '
                        f'{fl / dt / 1e12:.1f} TFLOP/s '
                        f'({fl / dt / 197e12 * 100:.0f}% MFU of v5e bf16)')
        except Exception:
            pass
        print(msg, flush=True)
        return

    if args.compile_only:
        import jax.numpy as jnp
        lq_a = jnp.asarray(np.asarray(batch(0)['lq']))
        gt_a = jnp.asarray(np.asarray(batch(0)['gt']))
        t0 = time.perf_counter()
        if args.chain > 1:
            # warm/cost the CHAINED program (lax.scan over K steps) —
            # the expensive compile the wall-clock --chain phases need
            k = args.chain
            lq_s = jnp.stack([lq_a] * k)
            gt_s = jnp.stack([gt_a] * k)
            cc = model._train_chain.lower(model.state, lq_s, gt_s,
                                          model.params_hq).compile()
            print(f'chain{k} compile: {time.perf_counter() - t0:.1f}s, '
                  f'{_entry_instrs(cc)} entry instructions', flush=True)
            t0 = time.perf_counter()
        c = model._train_step.lower(model.state, lq_a, gt_a,
                                    model.params_hq).compile()
        print(f'step compile: {time.perf_counter() - t0:.1f}s', flush=True)
        ca = c.cost_analysis() or {}
        if 'flops' in ca:
            print(f'step flops: {float(ca["flops"]) / 1e12:.2f} TFLOP',
                  flush=True)
        if 'bytes accessed' in ca:
            byts = float(ca['bytes accessed'])
            print(f'step program: {byts / 1e9:.2f} GB accessed -> '
                  f'HBM roofline {byts / 819e9 * 1e3:.1f} ms/step',
                  flush=True)
        print(f'step program: {_entry_instrs(c)} entry instructions',
              flush=True)
        if args.dump_hlo:
            with open(args.dump_hlo, 'w') as f:
                f.write(c.as_text())
            print(f'HLO written to {args.dump_hlo}', flush=True)
        return

    if args.chain > 1:
        # K steps per dispatch: ONE scan program, donated state — the
        # honest device number on dispatch-bound hosts (VERDICT r2 item 4)
        k = args.chain
        t0 = time.perf_counter()
        model.optimize_parameters_chained([batch(i) for i in range(k)])
        log = model.get_current_log()
        print(f'compile+chain1({k} steps): {time.perf_counter() - t0:.1f}s '
              f'l_g_total={log["l_g_total"]:.3f}', flush=True)
        # per-step FLOPs + HBM bytes from the single-step program's cost
        # analysis: decides whether the step is MXU-, HBM- or
        # dispatch-bound (the 2%-MFU question, NOTES_ROUND3.md)
        flops = None
        try:
            import jax.numpy as jnp
            lq_a = jnp.asarray(batch(0)['lq'])
            gt_a = jnp.asarray(batch(0)['gt'])
            c = model._train_step.lower(model.state, lq_a, gt_a,
                                        model.params_hq).compile()
            ca = c.cost_analysis()
            if ca and 'flops' in ca:
                flops = float(ca['flops'])
            if ca and 'bytes accessed' in ca:
                byts = float(ca['bytes accessed'])
                print(f'step program: {byts / 1e9:.2f} GB accessed -> '
                      f'HBM roofline {byts / 819e9 * 1e3:.1f} ms/step',
                      flush=True)
        except Exception as e:
            print(f'(cost analysis unavailable: {e})', flush=True)
        n_chains = max(1, args.iters // k)
        t0 = time.perf_counter()
        for i in range(n_chains):
            model.optimize_parameters_chained(
                [batch(i * k + j + 1) for j in range(k)])
            model.get_current_log()
        dt = (time.perf_counter() - t0) / (n_chains * k)
        msg = (f'{stage} gt={gt} batch={args.batch} dtype={args.dtype} '
               f'chain={k}: {dt * 1e3:.0f} ms/step -> '
               f'{args.batch / dt:.2f} img/s')
        if flops:
            msg += (f', {flops / 1e12:.2f} TFLOP/step -> '
                    f'{flops / dt / 1e12:.1f} TFLOP/s '
                    f'({flops / dt / 197e12 * 100:.0f}% MFU of v5e bf16)')
        print(msg, flush=True)
        return

    t0 = time.perf_counter()
    model.feed_data(batch(0))
    model.optimize_parameters(1)
    log = model.get_current_log()   # forces host sync of the loss dict
    print(f'compile+step1: {time.perf_counter() - t0:.1f}s '
          f'l_g_total={log["l_g_total"]:.3f}', flush=True)

    t0 = time.perf_counter()
    for i in range(args.iters):
        model.feed_data(batch(i + 1))
        model.optimize_parameters(i + 2)
        if args.sync_every_step:
            model.get_current_log()
    if not args.sync_every_step:
        model.get_current_log()   # one sync at the end (pipelined dispatch)
    dt = (time.perf_counter() - t0) / args.iters
    ips = args.batch / dt
    print(f'{stage} gt={gt} batch={args.batch} dtype={args.dtype}: '
          f'{dt * 1e3:.0f} ms/step -> {ips:.2f} img/s', flush=True)


if __name__ == '__main__':
    main()
