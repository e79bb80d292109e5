#!/usr/bin/env python
"""Per-segment wall-clock attribution of the jitted G+D training step.

Round-3 closed the H2D and state-round-trip hypotheses for the 2%-MFU
training step (NOTES_ROUND3.md window 4 + the 2026-08-19 01:57 state
probe: donated TrainState->TrainState dispatch = 36 ms), and the
2026-08-19 02:30 `train_gen32` run proved the step PROGRAM itself runs at
~56x its 114.5 ms HBM roofline (6403 ms/step, 1.2 TFLOP/s, zero H2D).
This probe times each structural piece of the step in isolation — the
same scan-chained, varied-input, host-fetch-synced methodology as
train_step_probe --gen-chain — so the 6.4 s attributes to a segment:

  deg     on-device BSRGAN degradation (ops/degradations_jax.py)
  hq      frozen-HQ no-grad forward (gt_indices supervision)
  g_fwd   generator forward only
  g_grad  generator forward+backward (value_and_grad, no update)
  d_grad  discriminator real+fake forward+backward (+ spectral update)
  adam    both optax Adam updates on fixed grad trees
  full    the complete train step (reference point = train_gen32)

Matches the hot loop of /root/reference/basicsr/models/femasr_model.py:
137-215 (optimize_parameters).

Usage:
  timeout 580 python scripts/train_segment_probe.py --segments deg,hq
  timeout 580 python scripts/train_segment_probe.py --segments g_grad,d_grad
"""
import argparse
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--gt', type=int, default=256)
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--dtype', default='bfloat16')
    ap.add_argument('--chain', type=int, default=8,
                    help='K segment executions per dispatch (lax.scan)')
    ap.add_argument('--chains', default='',
                    help="comma list of K values; runs the segment once "
                         "per K in ONE process (same relay window — the "
                         "K=8:105ms vs K=32:2404ms discriminator needs "
                         "same-window pairing to rule out chip state)")
    ap.add_argument('--dispatches', type=int, default=2,
                    help='timed dispatches after compile+warmup')
    ap.add_argument('--segments',
                    default='deg,hq,g_fwd,g_grad,d_grad,adam,full')
    ap.add_argument('--donate', action='store_true',
                    help="donate the 'full' chain's TrainState carry like "
                         'train_step_probe --gen-chain does (the 105 ms vs '
                         '1608 ms harness-contradiction discriminator)')
    ap.add_argument('--compile-only', action='store_true')
    args = ap.parse_args()

    import jax
    cache_dir = os.path.expanduser('~/.cache/femasr_tpu/jax_cache')
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
    import jax.numpy as jnp
    import numpy as np

    from femasr_tpu.ops.degradations_jax import degradation_bsrgan_jax
    from femasr_tpu.train import build_model
    from femasr_tpu.utils.checkpoint import save_pytree, to_host
    from femasr_tpu.utils.options import yaml_load

    tmp = '/tmp/femasr_seg_probe'
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
  train: {{phase: train, scale: 4, gt_size: {args.gt},
           on_device_degradation: true}}
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
        return opt

    hq0 = build_model(make_opt('seg_hq_init', False))
    save_pytree({'params': to_host(hq0.state.params_g)},
                f'{tmp}/models/hq.ckpt')
    del hq0
    model = build_model(make_opt('seg_probe', True))

    B, G = args.batch, args.gt
    L = G // 4
    K = args.chain
    net_g, net_d, net_hq = model.net_g, model.net_d, model.net_hq
    cri_pix, cri_gan = model.cri_pix, model.cri_gan
    tx_g, tx_d = model.tx_g, model.tx_d
    state = model.state
    params_hq = model.params_hq

    def gen_gt(kk):
        return jax.random.uniform(kk, (B, G, G, 3), jnp.float32)

    def gen_lq(kk):
        return jax.random.uniform(kk, (B, L, L, 3), jnp.float32)

    # one real HQ forward for constant gt_indices (values don't affect
    # timing; shapes must match the LQ-stage supervision path)
    _, _, _, idx_const = net_hq.apply(
        {'params': params_hq},
        jnp.zeros((B, G, G, 3), net_hq.dtype))
    idx_const = [jax.lax.stop_gradient(i) for i in idx_const]

    def g_loss(params_g, lq_in, gt_in, gt_idx):
        out, l_codebook, _, idx_list = net_g.apply(
            {'params': params_g}, lq_in.astype(net_g.dtype),
            gt_indices=gt_idx, train=True)
        out32 = out.astype(jnp.float32)
        total = l_codebook * 1.0 + cri_pix(out32, gt_in)
        fake_pred = net_d.apply(
            {'params': jax.lax.stop_gradient(state.params_d),
             'spectral': state.spectral}, out.astype(net_d.dtype))
        total += cri_gan(fake_pred, True, is_disc=False)
        return total, out32

    def d_fn(pd, spec, x, label, update):
        if update:
            pred, mut = net_d.apply({'params': pd, 'spectral': spec},
                                    x.astype(net_d.dtype),
                                    update_stats=True, mutable=['spectral'])
            spec = mut['spectral']
        else:
            pred = net_d.apply({'params': pd, 'spectral': spec},
                               x.astype(net_d.dtype))
        return cri_gan(pred, label, is_disc=True), spec

    grads_g_const = jax.tree.map(
        lambda p: jnp.full(p.shape, 1e-6, p.dtype), state.params_g)
    grads_d_const = jax.tree.map(
        lambda p: jnp.full(p.shape, 1e-6, p.dtype), state.params_d)

    def seg_body(seg):
        """(acc, i, base) -> acc' — one chained execution of the segment."""
        def body(acc, i, base):
            kk = jax.random.fold_in(jax.random.PRNGKey(11), base + i)
            if seg == 'deg':
                lq2, gt2 = degradation_bsrgan_jax(
                    jax.random.fold_in(kk, 9), gen_gt(kk), sf=4)
                return acc + jnp.mean(lq2) + jnp.mean(gt2)
            if seg == 'hq':
                rec, _, _, idxs = net_hq.apply(
                    {'params': params_hq}, gen_gt(kk).astype(net_hq.dtype))
                return (acc + jnp.mean(rec.astype(jnp.float32))
                        + sum(jnp.mean(ix.astype(jnp.float32))
                              for ix in idxs))
            if seg == 'g_fwd':
                out, l_cb, _, _ = net_g.apply(
                    {'params': state.params_g},
                    gen_lq(kk).astype(net_g.dtype),
                    gt_indices=idx_const, train=True)
                return acc + jnp.mean(out.astype(jnp.float32)) + l_cb
            if seg == 'g_grad':
                (l, out32), gr = jax.value_and_grad(
                    g_loss, has_aux=True)(state.params_g, gen_lq(kk),
                                          gen_gt(kk), idx_const)
                leafsum = sum(jnp.sum(jnp.abs(x)) for x in
                              jax.tree.leaves(gr)[:4])
                return acc + l + leafsum.astype(jnp.float32) * 0
            if seg == 'd_grad':
                gt_in = gen_gt(kk)
                fake = gen_gt(jax.random.fold_in(kk, 3))
                (l_r, spec1), g_r = jax.value_and_grad(
                    d_fn, has_aux=True)(state.params_d, state.spectral,
                                        gt_in, True, True)
                (l_f, _), g_f = jax.value_and_grad(
                    d_fn, has_aux=True)(state.params_d, spec1,
                                        fake, False, True)
                leafsum = sum(jnp.sum(jnp.abs(a + b)) for a, b in
                              zip(jax.tree.leaves(g_r)[:4],
                                  jax.tree.leaves(g_f)[:4]))
                return acc + l_r + l_f + leafsum.astype(jnp.float32) * 0
            raise ValueError(seg)
        return body

    def timed(seg):
        if seg == 'adam':
            # carries (params, opt) x2 so iterations are dependent; grads
            # scaled by the loop index so the relay value-cache misses
            import optax

            def chain(pg, og, pd_, od, base):
                def body(c, i):
                    pg, og, pd_, od = c
                    s = (base + i + 1).astype(jnp.float32) * 1e-8
                    gg = jax.tree.map(lambda g: g * s, grads_g_const)
                    ug, og = tx_g.update(gg, og, pg)
                    pg = optax.apply_updates(pg, ug)
                    gd = jax.tree.map(lambda g: g * s, grads_d_const)
                    ud, od = tx_d.update(gd, od, pd_)
                    pd_ = optax.apply_updates(pd_, ud)
                    return (pg, og, pd_, od), None
                (pg, og, pd_, od), _ = jax.lax.scan(
                    body, (pg, og, pd_, od), jnp.arange(K))
                return sum(jnp.sum(x.astype(jnp.float32))
                           for x in jax.tree.leaves(pg)[:2])
            f = jax.jit(chain)
            fargs = lambda d: (state.params_g, state.opt_g, state.params_d,
                               state.opt_d, jnp.int32(d * K))
        elif seg in ('full', 'deg_full'):
            inner = model._train_step

            def chain(st, base):
                def body(st, i):
                    kk = jax.random.fold_in(jax.random.PRNGKey(7), base + i)
                    if seg == 'deg_full':
                        # the real pipeline shape: on-device BSRGAN LQ
                        # synthesis feeding the step inside the same scan
                        # body (gen32-vs-nodeg measured this interaction
                        # at +4795 ms/step while 'deg' alone is 12 ms)
                        gt_in = gen_gt(kk)
                        lq_in, gt_in = degradation_bsrgan_jax(
                            jax.random.fold_in(kk, 9), gt_in, sf=4)
                    else:
                        lq_in, gt_in = gen_lq(kk), gen_gt(kk)
                    st, ld, _ = inner(st, lq_in, gt_in, params_hq)
                    return st, ld['l_g_total']
                st, ls = jax.lax.scan(body, st, jnp.arange(K))
                return st, ls[-1]
            if args.donate:
                f0 = jax.jit(chain, donate_argnums=(0,))
            else:
                f0 = jax.jit(chain)
            carry = {'st': state}

            def f(st_ignored, base):
                # chain the carried state across dispatches (like a real
                # training run / the gen-chain probe) so donation is legal
                new_st, l_last = f0(carry['st'], base)
                carry['st'] = new_st
                return l_last
            f.lower = lambda *a: f0.lower(*a)
            fargs = lambda d: (state if d == 0 else None, jnp.int32(d * K))
        else:
            body = seg_body(seg)

            def chain(base):
                acc, _ = jax.lax.scan(
                    lambda a, i: (body(a, i, base), None),
                    jnp.zeros((), jnp.float32), jnp.arange(K))
                return acc
            f = jax.jit(chain)
            fargs = lambda d: (jnp.int32(d * K),)

        t0 = time.perf_counter()
        lowered = f.lower(*fargs(0))
        compiled = lowered.compile()
        tc = time.perf_counter() - t0
        ca = compiled.cost_analysis() or {}
        # HloCostAnalysis counts a while/scan BODY ONCE (verified on this
        # jax build: scan of 8 matmuls reports 1x matmul flops) — so for
        # these K-chained programs cost_analysis IS the per-exec cost, up
        # to the (small) outside-the-loop ops. Round-4 note: the original
        # /K here understated per-exec FLOPs/bytes by 8x and produced the
        # fictional '2% MFU' training story (NOTES_ROUND4.md).
        fl = float(ca.get('flops', 0.0))
        by = float(ca.get('bytes accessed', 0.0))
        print(f'[{seg}] compile {tc:.1f}s; per-exec (scan-body-once) '
              f'{fl / 1e12:.2f} TFLOP, {by / 1e9:.2f} GB -> roofline '
              f'{by / 819e9 * 1e3:.1f} ms', flush=True)
        if args.compile_only:
            return
        t0 = time.perf_counter()
        _ = float(f(*fargs(0)))
        print(f'[{seg}] warmup dispatch: {time.perf_counter() - t0:.1f}s',
              flush=True)
        t0 = time.perf_counter()
        for d in range(args.dispatches):
            _ = float(f(*fargs(d + 1)))
        dt = (time.perf_counter() - t0) / (args.dispatches * K) * 1e3
        eff = f', {fl / (dt / 1e3) / 1e12:.1f} TFLOP/s' if fl else ''
        print(f'[{seg}] {dt:.0f} ms/exec (chain={K}){eff}', flush=True)

    chain_values = ([int(x) for x in args.chains.split(',') if x]
                    or [args.chain])
    for kv in chain_values:
        K = kv
        if len(chain_values) > 1:
            print(f'--- chain K={K} ---', flush=True)
        for seg in args.segments.split(','):
            timed(seg.strip())


if __name__ == '__main__':
    main()
