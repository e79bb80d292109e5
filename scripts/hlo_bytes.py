#!/usr/bin/env python
"""Per-instruction HBM-traffic attribution for the x4 serving program.

The serving program runs at ~94% of its HBM roofline on the v5e
(NOTES_ROUND3.md: 171.6 GB accessed -> 209.6 ms roofline vs 224 ms
measured healthy-window) — wall-clock IS bytes. This tool compiles the
same program bench.py measures (params as arguments) and walks the
optimized HLO text, computing the PHYSICAL size of every instruction's
operands + output (layout-aware: TPU tile padding T(8,128)(2,1) etc.),
then prints:

  - top instructions by traffic (with shapes + JAX scope metadata)
  - totals by opcode (fusion/convolution/copy/...)
  - totals by model scope (encoder / swin / decoder_group_i / ...)

so the byte bloat (3-4x over the analytic minimum) is attributable to
specific modules and fixable. Runs on CPU (JAX_PLATFORMS=cpu; different
fusion decisions, indicative only) or on the TPU backend (compile-only —
no execution, safe for a flapping relay as long as the program is in the
persistent compile cache).

Usage: python scripts/hlo_bytes.py 512 [--fused|--s2d] [--top 40]
"""
import argparse
import os
import re
import sys
from collections import defaultdict

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

DTYPE_BYTES = {
    'f64': 8, 'f32': 4, 'f16': 2, 'bf16': 2, 'f8e4m3fn': 1, 'f8e5m2': 1,
    's64': 8, 'u64': 8, 's32': 4, 'u32': 4, 's16': 2, 'u16': 2,
    's8': 1, 'u8': 1, 'pred': 1, 'c64': 8, 'c128': 16, 's4': 0.5,
    'u4': 0.5,
}

SHAPE_RE = re.compile(r'([a-z0-9]+)\[([0-9,]*)\](?:\{([^}]*)\})?')


def shape_bytes(dtype, dims, layout):
    """Physical bytes of one array shape, honoring TPU tiling padding."""
    esize = DTYPE_BYTES.get(dtype)
    if esize is None:
        return 0
    if not dims:
        return esize
    d = list(dims)
    tile = None
    if layout:
        groups = re.findall(r'T\(([0-9,]+)\)((?:\([0-9,]+\))*)', layout)
        if groups:
            tile = [int(v) for v in groups[0][0].split(',')]
            sub = re.findall(r'\(([0-9,]+)\)', groups[0][1])
            if sub:
                tile[0] *= int(sub[0].split(',')[0])
            mtm = layout.split(':')[0]
            try:
                perm = [int(v) for v in mtm.split(',')]
                # physical order: major..minor = reversed minor-to-major
                d = [dims[i] for i in reversed(perm)]
            except ValueError:
                pass
    if tile:
        k = min(len(tile), len(d))
        for j in range(k):
            t = tile[len(tile) - 1 - j]
            i = len(d) - 1 - j
            d[i] = -(-d[i] // t) * t
    n = 1
    for v in d:
        n *= v
    return n * esize


def parse_shape_bytes(text, logical=False):
    """Total bytes of a (possibly tuple) shape string.

    logical=False: physical layout bytes incl. TPU tile padding (shows
    layout waste). logical=True: unpadded element bytes — this is what
    XLA cost_analysis 'bytes accessed' counts, and what wall-clock
    tracks on the v5e (verified 2026-08-17: logical 97.85 GB vs
    cost_analysis 97.29 vs padded-physical 183.2 on the same program).
    """
    total = 0
    for m in SHAPE_RE.finditer(text):
        dtype, dim_s, layout = m.group(1), m.group(2), m.group(3)
        if dtype not in DTYPE_BYTES:
            continue
        dims = [int(v) for v in dim_s.split(',')] if dim_s else []
        total += shape_bytes(dtype, dims, None if logical else layout)
    return total


INSTR_RE = re.compile(
    r'^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(\(?.*?\)?)\s+([\w\-]+)\((.*)$')
FREE_OPS = {'parameter', 'constant', 'tuple', 'get-tuple-element',
            'bitcast', 'after-all', 'iota'}


def scope_of(op_name, depth):
    """Collapse a JAX op_name path to a model scope key."""
    parts = [p for p in op_name.split('/')
             if p and not p.startswith('jit(')]
    return '/'.join(parts[:depth]) if parts else '(none)'


def fusion_metadata(hlo):
    """Map fusion-computation name -> a representative op_name metadata
    (fusion call sites often carry no metadata; their bodies do)."""
    meta = {}
    cur = None
    for line in hlo.splitlines():
        mc = re.match(r'^%?([\w.\-]+)[^=]*\{$', line)
        if mc:
            cur = mc.group(1)
            continue
        if line.startswith('}'):
            cur = None
            continue
        if cur and cur not in meta:
            mm = re.search(r'op_name="([^"]+)"', line)
            if mm:
                meta[cur] = mm.group(1)
    return meta


def analyze(hlo, top_n=40, scope_depth=3, scope_filter=None,
            opcode_filter=None):
    # ENTRY computation: from 'ENTRY' to the closing brace at column 0
    m = re.search(r'^ENTRY [^\n]*\{$(.*?)^\}', hlo, re.M | re.S)
    body = m.group(1) if m else hlo
    fmeta = fusion_metadata(hlo)

    out_bytes = {}
    defs = {}   # instr name -> (opcode, scope) of its definition
    uses = defaultdict(list)   # instr name -> [(consumer opcode, scope)]
    rows = []
    for line in body.splitlines():
        mi = INSTR_RE.match(line)
        if not mi:
            continue
        name, shape_s, opcode, rest = mi.groups()
        ob = parse_shape_bytes(shape_s, logical=True)
        out_bytes[name] = ob
        # operands: %refs inside the first paren group (before ), kind= etc)
        depth_p, end = 1, len(rest)
        for i, ch in enumerate(rest):
            if ch == '(':
                depth_p += 1
            elif ch == ')':
                depth_p -= 1
                if depth_p == 0:
                    end = i
                    break
        opnd_txt = rest[:end]
        opnds = re.findall(r'%?([\w.\-]+)', opnd_txt)
        ib = sum(out_bytes.get(o, 0) for o in opnds)
        mm = re.search(r'op_name="([^"]+)"', rest)
        op_name = mm.group(1) if mm else None
        if op_name is None:
            mcall = re.search(r'calls=%?([\w.\-]+)', rest)
            if mcall:
                op_name = fmeta.get(mcall.group(1))
        op_name = op_name or '(no-metadata)'
        defs[name] = (opcode, op_name)
        for o in opnds:
            if o in defs:
                uses[o].append((opcode, op_name))
        if opcode in FREE_OPS:
            continue
        if scope_filter and scope_filter not in op_name:
            continue
        if opcode_filter and opcode != opcode_filter:
            continue
        rows.append((ib + ob, ob, ib, opcode, name, shape_s.strip(),
                     op_name, opnds))

    rows.sort(key=lambda r: r[:7], reverse=True)
    total = sum(r[0] for r in rows)
    print(f'TOTAL traffic (operands+outputs, LOGICAL bytes — the '
          f'cost_analysis/wall-clock currency): '
          f'{total / 1e9:.2f} GB -> {total / 819e9 * 1e3:.1f} ms @819GB/s')
    print(f'\n== top {top_n} instructions ==')
    for tb, ob, ib, opcode, name, shape_s, op_name, opnds in rows[:top_n]:
        sh = shape_s if len(shape_s) < 48 else shape_s[:45] + '...'
        scope = op_name if len(op_name) < 80 else '...' + op_name[-77:]
        print(f'  {tb / 1e9:7.2f} GB (out {ob / 1e9:6.2f}) {opcode:14s} '
              f'{sh:48s} {scope}')
        if opcode_filter:
            # producer/consumer context: who feeds this op, who reads it —
            # the data the copy-elimination campaign needs (a copy whose
            # producer and consumer are both fusions is a layout
            # assignment artifact; one flanked by convolutions is an
            # NHWC<->blocked relayout; one feeding a custom-call is an
            # alignment pad)
            for o in opnds:
                if o in defs:
                    pop, pscope = defs[o]
                    pscope = pscope if len(pscope) < 70 else \
                        '...' + pscope[-67:]
                    print(f'      <- {pop:14s} {pscope}')
            for cop, cscope in uses.get(name, [])[:4]:
                cscope = cscope if len(cscope) < 70 else \
                    '...' + cscope[-67:]
                print(f'      -> {cop:14s} {cscope}')

    by_op = defaultdict(float)
    for tb, _ob, _ib, opcode, *_r in rows:
        by_op[opcode] += tb
    print('\n== by opcode ==')
    for k, v in sorted(by_op.items(), key=lambda kv: -kv[1]):
        print(f'  {v / 1e9:8.2f} GB  {k}')

    by_scope = defaultdict(float)
    for tb, ob, ib, opcode, name, shape_s, op_name, _o in rows:
        by_scope[scope_of(op_name, scope_depth)] += tb
    print(f'\n== by scope (depth {scope_depth}) ==')
    for k, v in sorted(by_scope.items(), key=lambda kv: -kv[1]):
        print(f'  {v / 1e9:8.2f} GB  {k}')

    # -- padding tax of MATERIALIZED buffers ------------------------------
    # cost_analysis counts LOGICAL bytes, but the chip moves PHYSICAL
    # (tile-padded) bytes for every buffer that actually reaches HBM.
    # ENTRY-level instruction outputs ARE the materialized set (fusion
    # bodies never hit HBM), so phys-minus-logical of each output, summed,
    # is the traffic invisible to the roofline model. Prime suspect for
    # the 157-vs-118.8 ms gap: the decoder tail runs C=64 (half a
    # (8,128) lane tile -> 2x padding) and out_conv C=3.
    pad_rows = []
    for line in body.splitlines():
        mi = INSTR_RE.match(line)
        if not mi:
            continue
        name, shape_s, opcode, rest = mi.groups()
        if opcode in FREE_OPS:
            continue
        lg = parse_shape_bytes(shape_s, logical=True)
        ph = parse_shape_bytes(shape_s, logical=False)
        if ph > lg:
            op, op_name = defs.get(name, (opcode, '(no-metadata)'))
            pad_rows.append((ph - lg, lg, ph, opcode, shape_s.strip(),
                             op_name))
    pad_rows.sort(reverse=True)
    waste = sum(r[0] for r in pad_rows)
    lg_all = sum(out_bytes[n] for n, (op, _s) in defs.items()
                 if op not in FREE_OPS)
    print(f'\n== padding tax (materialized outputs only) ==')
    print(f'  logical out {lg_all / 1e9:.2f} GB; physical-minus-logical '
          f'WASTE {waste / 1e9:.2f} GB -> {waste / 819e9 * 1e3:.1f} ms '
          f'@819GB/s (writes; reads of these buffers pay it again)')
    for w, lg, ph, opcode, shape_s, op_name in pad_rows[:15]:
        sh = shape_s if len(shape_s) < 46 else shape_s[:43] + '...'
        scope = op_name if len(op_name) < 70 else '...' + op_name[-67:]
        print(f'  {w / 1e9:7.2f} GB waste ({ph / lg:4.1f}x) {opcode:12s} '
              f'{sh:46s} {scope}')
    pad_scope = defaultdict(float)
    for w, lg, ph, opcode, shape_s, op_name in pad_rows:
        pad_scope[scope_of(op_name, scope_depth)] += w
    print('  -- waste by scope --')
    for k, v in sorted(pad_scope.items(), key=lambda kv: -kv[1])[:12]:
        print(f'  {v / 1e9:8.2f} GB  {k}')
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('tile', type=int, default=512, nargs='?')
    ap.add_argument('batch', type=int, nargs='?', default=1)
    ap.add_argument('--fused', action='store_true')
    ap.add_argument('--s2d', action='store_true')
    ap.add_argument('--ws2d', action='store_true',
                    help='Pallas ws2d decoder tail (round-5)')
    ap.add_argument('--ws2d-levels', type=int, default=1,
                    help='last N decoder levels in ws2d (with --ws2d)')
    ap.add_argument('--ws2d-enc-up', action='store_true',
                    help='encoder last up block in ws2d too (needs '
                         '--ws2d-levels 2)')
    ap.add_argument('--int8-mlp', action='store_true',
                    help='per-token int8 chain for the swin MLPs')
    ap.add_argument('--top', type=int, default=40)
    ap.add_argument('--scope-depth', type=int, default=3)
    ap.add_argument('--dump', help='also write the HLO text here')
    ap.add_argument('--filter', default=None,
                    help='only attribute instructions whose op_name '
                         'contains this substring (e.g. blocks_1)')
    ap.add_argument('--opcode', default=None,
                    help='restrict to one opcode (e.g. copy) and print '
                         'each listed op\'s producer/consumer context')
    ap.add_argument('--from-dump', default=None,
                    help='analyze a previously dumped HLO text file '
                         '(no compile, no backend needed)')
    args = ap.parse_args()

    if args.from_dump:
        with open(args.from_dump) as f:
            analyze(f.read(), args.top, args.scope_depth, args.filter,
                args.opcode)
        return

    import jax
    cache_dir = os.path.expanduser('~/.cache/femasr_tpu/jax_cache')
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
    import jax.numpy as jnp
    from femasr_tpu.models import FeMaSRNet

    model = FeMaSRNet(codebook_params=[[32, 1024, 512]], LQ_stage=True,
                      scale_factor=4, norm_type='gn', act_type='silu',
                      fused_upsample=args.fused, s2d_tail=args.s2d,
                      ws2d_tail=args.ws2d, ws2d_levels=args.ws2d_levels,
                      ws2d_enc_up=args.ws2d_enc_up,
                      int8_mlp=args.int8_mlp, dtype=jnp.bfloat16)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, args.tile, args.tile, 3), jnp.bfloat16))['params']

    @jax.jit
    def forward(params, x):
        out, _, _, _ = model.apply({'params': params}, x)
        return jnp.sum(out.astype(jnp.float32))

    shape = (args.batch, args.tile, args.tile, 3)
    compiled = forward.lower(params,
                             jnp.zeros(shape, jnp.bfloat16)).compile()
    cost = compiled.cost_analysis()
    if cost and 'bytes accessed' in cost:
        b = float(cost['bytes accessed'])
        print(f'[cost_analysis] bytes accessed: {b / 1e9:.2f} GB '
              f'(backend {jax.default_backend()})')
    hlo = compiled.as_text()
    if args.dump:
        with open(args.dump, 'w') as f:
            f.write(hlo)
    analyze(hlo, args.top, args.scope_depth, args.filter, args.opcode)


if __name__ == '__main__':
    main()
