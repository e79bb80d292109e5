"""Pallas TPU bf16 3x3 conv on the width-space-to-depth (ws2d) form.

Why this kernel exists (round 5, bench_evidence/copy_attrib_512_full_r5.txt):
the 512px serving program's wall-clock equals its PHYSICAL-byte roofline,
and the decoder tail (C=64 at 2048px) dominates the physical padding waste:
XLA stages every NHWC conv input/output as [H,1,8,W/8,C]{T(8,128)(2,1)},
which pays 2.0x on the 8-sublane staging dim (bf16 packing wants 16) and
another 2.0x on the half-filled 128-lane tile at C=64 — 14.56 GB of pure
padding waste in decoder_group_2. Every XLA-level reformulation measured
(s2d phase-slices at two alignments, NCHW) re-materializes more than it
saves (FORMULATIONS.md, scripts/tail_layout_probe.py).

The ws2d form sidesteps the tax entirely: view (B, H, W, C) as
(B, H, W/2, 2C) — a pure reshape; element (m, qx*C + c) is HR pixel
(2m+qx, c). For C=64 the last dim becomes 128 = exactly one lane tile, and
every elementwise/norm op on the form tiles cleanly in XLA. This kernel
computes the HR 3x3 SAME conv directly on the form:

    V[y, 2w'+px, o] = sum_{u,l} K[u, l, c, o] * U[y+u-1, 2w'+px+l-1, c]

collapses to nine (th*Wh, 2C) @ (2C, 2O) MXU dots over taps
(u in 0..2) x (dm in -1..1) with trace-time block kernels B[u][dm]:

    B[-1] = [[0,    0 ],[K[u,0], 0    ]]      (rows: qx=0 | qx=1 blocks,
    B[ 0] = [[K[u,1], K[u,0]],[K[u,2], K[u,1]]]  cols: px=0 | px=1)
    B[+1] = [[0, K[u,2]],[0,    0    ]]

(derivation checked against the composite nearest/conv path in
tests/test_ws2d_conv.py). f32 accumulation, bias + optional activation in
the epilogue, bf16 in/out — activations cross HBM exactly twice with ZERO
tile-padding waste. Dense blocks cost 2x the HR MAC count, but at full
128-lane MXU width vs XLA's half-filled C=64 dots.

Serving-only (no custom VJP — the tail flag is a serving optimization,
like int8_tail). Replaces, at full MXU width, the decoder-tail convs of
/root/reference/basicsr/archs/femasr_arch.py:195-211 as instantiated at
the finest scale.

Mosaic constraints honored (probed round 4, int8 conv kernel): HBM->VMEM
window copies need (8,128)-aligned slice shapes; scoped VMEM ~16M — the
row-strip height is VMEM-budgeted (FEMASR_WS2D_TH overrides for probes).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def ws2d_blocks(kernel: jax.Array) -> jax.Array:
    """(3, 3, I, O) HR kernel -> (9, 2I, 2O) ws2d tap blocks.

    Index u * 3 + (dm + 1); block rows are [qx=0 | qx=1] input-phase
    halves, cols [px=0 | px=1] output-phase halves.
    """
    i_ch, o_ch = kernel.shape[2], kernel.shape[3]
    z = jnp.zeros((i_ch, o_ch), kernel.dtype)
    rows = []
    for u in range(3):
        k0, k1, k2 = kernel[u, 0], kernel[u, 1], kernel[u, 2]
        bm1 = jnp.block([[z, z], [k0, z]])
        b0 = jnp.block([[k1, k0], [k2, k1]])
        bp1 = jnp.block([[z, k2], [z, z]])
        rows += [bm1, b0, bp1]
    return jnp.stack(rows, 0)


def _epilogue(y, bias2, act: Optional[str]):
    if bias2 is not None:
        y = y + bias2
    if act == 'silu':
        y = y * jax.nn.sigmoid(y)
    elif act == 'lrelu':
        y = jnp.where(y >= 0, y, 0.2 * y)
    elif act is not None:
        raise ValueError(f'unknown fused activation {act!r}')
    return y


def _ws2d_kernel(x_hbm, w_ref, b_ref, ps_ref, pb_ref, o_ref, x_vmem,
                 sem, *, th: int, w_out: int, w_in: int, c2: int,
                 act: Optional[str], out_dtype, dots: int,
                 pre_act: Optional[str], h_valid: int, wh_valid: int,
                 db: bool):
    """One (th, w_out) output row-strip; batch 1.

    x_hbm holds the zero-padded (H + 2, Wp, 2C) ws2d input (1-row halo
    top/bottom = the HR SAME row padding; 1-col halo left/right = the
    dm = +-1 taps, exact because a ws2d column pair is two HR columns).

    dots=6 (default): per row-tap u, ONE dense center dot plus ONE
    packed edge dot — the dm=-1 block is nonzero only in its q1-input
    half and dm=+1 only in q0, so [x_(dm=-1) hi-lanes | x_(dm=+1)
    lo-lanes] @ [B-1 lower-rows ; B+1 upper-rows] covers both at full
    MXU width. 6 dots = 1.33x HR MACs (vs 2x for the plain 9-dot form,
    dots=9 / FEMASR_WS2D_DOTS=9 for A/Bs).
    """
    i = pl.program_id(0)
    n = pl.num_programs(0)
    if db:
        # double-buffered window DMA: scratch persists across grid
        # steps, so step i waits on the copy step i-1 started (slot
        # i % 2) and prefetches strip i+1 into the other slot — the
        # serialized DMA-then-compute of the single-buffer form costs
        # ~6 us x 256 steps x 5 kernels on the 512px tail.
        slot = jax.lax.rem(i, 2)

        def strip_dma(s, j):
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(j * th, th + 2)], x_vmem.at[s],
                sem.at[s])

        @pl.when(i == 0)
        def _():
            strip_dma(0, 0).start()

        @pl.when(i + 1 < n)
        def _():
            strip_dma(jax.lax.rem(i + 1, 2), i + 1).start()

        strip_dma(slot, i).wait()
        x = x_vmem[slot]
    else:
        cp = pltpu.make_async_copy(
            x_hbm.at[pl.ds(i * th, th + 2)], x_vmem, sem)
        cp.start()
        cp.wait()
        x = x_vmem[:]

    if ps_ref is not None:
        # fused GroupNorm-affine (+ activation) PROLOGUE: the stats pass
        # runs in XLA (a cheap reduce); the normalize+act pass — a full
        # HBM read+write per conv in the unfused chain — happens here in
        # VMEM. The zero halo (HR SAME padding) must stay zero, and
        # silu(b) != 0, so the pad region is re-masked by absolute
        # row/col index (exactly the pad-AFTER-act semantics of the
        # reference chain norm -> act -> conv_SAME).
        xf = (x.astype(jnp.float32) * ps_ref[:][0] + pb_ref[:][0])
        if pre_act == 'silu':
            xf = xf * jax.nn.sigmoid(xf)
        elif pre_act is not None:
            raise ValueError(f'unknown pre_act {pre_act!r}')
        row = (jax.lax.broadcasted_iota(jnp.int32, (th + 2, 1, 1), 0)
               + i * th)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, w_in, 1), 1)
        valid = ((row >= 1) & (row < h_valid + 1)
                 & (col >= 1) & (col < wh_valid + 1))
        x = jnp.where(valid, xf, 0.0).astype(x.dtype)

    f2 = w_ref.shape[2]
    m = th * w_out
    h2 = c2 // 2
    acc = jnp.zeros((m, f2), jnp.float32)
    if dots == 6:
        # constant lane masks: q1 lanes (>= h2) of the dm=-1 tap, q0
        # lanes (< h2) of the dm=+1 tap. The two edge blocks have
        # DISJOINT row supports (q1->p0 and q0->p1), so masked taps
        # dotted against their SUM is exact — one K=c2 edge dot per
        # row-tap with zero lane concats/slices (the concat form is
        # Mosaic-Not-implemented on this toolchain).
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, c2), 2)
        m_hi = (lane >= h2).astype(x.dtype)
        m_lo = (lane < h2).astype(x.dtype)
    for u in range(3):
        if dots == 6:
            ctr = x[u:u + th, 1:1 + w_out, :].reshape(m, c2)
            acc = acc + jax.lax.dot_general(
                ctr, w_ref[u * 3 + 1],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            edge = (x[u:u + th, 0:w_out, :] * m_hi
                    + x[u:u + th, 2:2 + w_out, :] * m_lo
                    ).reshape(m, c2)
            w_edge = w_ref[u * 3 + 0] + w_ref[u * 3 + 2]
            acc = acc + jax.lax.dot_general(
                edge, w_edge,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            for dm in range(3):
                tap = x[u:u + th, dm:dm + w_out, :].reshape(m, c2)
                acc = acc + jax.lax.dot_general(
                    tap, w_ref[u * 3 + dm],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

    bias2 = b_ref[:][0] if b_ref is not None else None
    y = _epilogue(acc, bias2, act)
    o_ref[:] = y.reshape(th, w_out, f2).astype(out_dtype)


def _resolve_interpret(interpret) -> bool:
    if interpret is None:
        return jax.default_backend() == 'cpu'
    return interpret


@functools.partial(jax.jit, static_argnames=('act', 'pre_act', 'th',
                                             'interpret'))
def conv3_ws2d(x: jax.Array, kernel: jax.Array,
               bias: Optional[jax.Array] = None,
               act: Optional[str] = None,
               pre_scale: Optional[jax.Array] = None,
               pre_bias: Optional[jax.Array] = None,
               pre_act: Optional[str] = None,
               th: Optional[int] = None,
               interpret=None) -> jax.Array:
    """3x3 SAME HR conv evaluated on the ws2d tensor.

    Args:
        x: (B, H, Wh, 2I) bf16/f32 — ws2d form of (B, H, 2*Wh, I).
        kernel: (3, 3, I, O) float (the SAME parameter as the plain conv).
        bias: optional (O,) float.
        act: optional fused epilogue activation ('silu' | 'lrelu').
        pre_scale/pre_bias: optional (B, 2I) or (2I,) f32 per-ws2d-channel
            affine applied to the INPUT in VMEM (+ pre_act) — folds the
            GroupNorm normalize pass (stats computed in XLA) into the
            kernel, saving one full HBM round trip per conv. Requires a
            lane-aligned channel dim.
        pre_act: optional activation after the pre-affine ('silu').
        th: output rows per grid step (None = VMEM-budgeted).
    Returns:
        (B, H, Wh, 2O) in x.dtype — ws2d form of the HR conv output.
    """
    interpret = _resolve_interpret(interpret)
    b, h, wh, c2 = x.shape
    blocks = ws2d_blocks(kernel.astype(jnp.float32)).astype(x.dtype)
    b2 = (None if bias is None
          else jnp.tile(bias.astype(jnp.float32), 2))
    if pre_scale is not None and pre_scale.ndim == 1:
        pre_scale = jnp.broadcast_to(pre_scale, (b, c2))
        pre_bias = jnp.broadcast_to(pre_bias, (b, c2))
    if b != 1:
        # static unroll, NOT vmap: Pallas TPU cannot batch the ANY-
        # memory-space x_hbm operand ("only blocks having the same
        # block shape as the array shape" — captured 2026-08-20 on the
        # 128px batch-2 bench rung); serving batches are small
        outs = [_ws2d_single(
            x[i], blocks, b2,
            None if pre_scale is None else pre_scale[i],
            None if pre_bias is None else pre_bias[i],
            act=act, pre_act=pre_act if pre_scale is not None else None,
            th=th, interpret=interpret) for i in range(b)]
        return jnp.stack(outs, 0)
    return _ws2d_single(
        x[0], blocks, b2,
        None if pre_scale is None else pre_scale[0],
        None if pre_bias is None else pre_bias[0],
        act=act, pre_act=pre_act, th=th, interpret=interpret)[None]


def _ws2d_single(x1, blocks, bias2, ps=None, pb=None, *, act, pre_act,
                 th, interpret):
    h, wh, c2 = x1.shape
    f2 = blocks.shape[2]

    env_th = os.environ.get('FEMASR_WS2D_TH')
    if th is None and env_th:
        th = int(env_th)

    wo = wh + (-wh) % 8                 # output width, sublane-aligned
    wip = (wo + 2) + (-(wo + 2)) % 8    # VMEM window width
    c_pad = (-c2) % LANES
    f_pad = (-f2) % LANES
    c2p, f2p = c2 + c_pad, f2 + f_pad
    # 6-dot (masked-edge) form: constant lane masks + the summed
    # disjoint-support edge blocks — 1.33x HR MACs vs the 9-dot's 2x at
    # full MXU width, no lane concats (the earlier concat variant was
    # Mosaic-Not-implemented; THIS form COMPILE PASSes at model shape,
    # ws2dconv_d6 2026-08-20 12:52 UTC). Needs the q0/q1 halves at
    # c2/2, i.e. an unpadded channel dim; tiny shapes fall back to 9.
    dots = 6 if c_pad == 0 else 9
    env_dots = os.environ.get('FEMASR_WS2D_DOTS')
    if env_dots:
        dots = int(env_dots)
    if dots == 6 and c_pad != 0:
        dots = 9

    db_env = os.environ.get('FEMASR_WS2D_DB', '1') != '0'

    def _vmem_est(t):
        return ((2 if db_env else 1) * (t + 2) * wip * c2p * 2  # window
                + t * wo * f2p * 4            # f32 acc
                + 2 * t * wo * f2p * 2        # double-buffered bf16 out
                + 9 * c2p * f2p * 2)          # bf16 tap blocks
    if th is None:
        for cand in (16, 8, 4, 2, 1):
            if _vmem_est(cand) <= 10 * 2**20:
                th = cand
                break
        else:
            th = 1
    h_pad = (-h) % th
    hp = h + h_pad

    if ps is not None:
        assert c_pad == 0, (
            'pre-affine needs a lane-aligned channel dim (got '
            f'{c2} channels)')

    x_p = jnp.pad(x1, ((1, 1 + h_pad), (1, wip - (wh + 1)), (0, c_pad)))
    if c_pad or f_pad:
        blocks = jnp.pad(blocks, ((0, 0), (0, c_pad), (0, f_pad)))
    b_2d = None if bias2 is None else jnp.pad(
        bias2, (0, f_pad)).reshape(1, -1)

    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec((9, c2p, f2p), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [x_p, blocks]
    db = db_env
    kw = dict(th=th, w_out=wo, w_in=wip, c2=c2p, act=act,
              out_dtype=x1.dtype, dots=dots, pre_act=pre_act,
              h_valid=h, wh_valid=wh, db=db)
    has_bias = bias2 is not None
    if has_bias:
        in_specs.append(pl.BlockSpec((1, f2p), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(b_2d)
    has_pre = ps is not None
    if has_pre:
        vec_spec = pl.BlockSpec((1, c2p), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)
        in_specs += [vec_spec, vec_spec]
        args += [ps.astype(jnp.float32).reshape(1, -1),
                 pb.astype(jnp.float32).reshape(1, -1)]

    def kern(*refs):
        k = 2
        b_ref = ps_ref = pb_ref = None
        if has_bias:
            b_ref = refs[k]
            k += 1
        if has_pre:
            ps_ref, pb_ref = refs[k], refs[k + 1]
            k += 2
        o_ref, x_vmem, sem = refs[k], refs[k + 1], refs[k + 2]
        _ws2d_kernel(refs[0], refs[1], b_ref, ps_ref, pb_ref, o_ref,
                     x_vmem, sem, **kw)

    out = pl.pallas_call(
        kern,
        grid=(hp // th,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((th, wo, f2p), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hp, wo, f2p), x1.dtype),
        scratch_shapes=[
            pltpu.VMEM(((2, th + 2, wip, c2p) if db
                        else (th + 2, wip, c2p)), x1.dtype),
            (pltpu.SemaphoreType.DMA((2,)) if db
             else pltpu.SemaphoreType.DMA),
        ],
        interpret=interpret,
    )(*args)
    return out[:h, :wh, :f2]
