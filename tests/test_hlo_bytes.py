"""Unit tests for the HLO traffic-attribution parser (scripts/hlo_bytes.py).

The analyzer is a measurement tool: wrong physical-byte math would send
the perf work chasing phantom hotspots, so the layout arithmetic (TPU
tile padding incl. bf16 sublane packing) is pinned here.
"""
import importlib.util
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
spec = importlib.util.spec_from_file_location(
    'hlo_bytes', os.path.join(HERE, 'scripts', 'hlo_bytes.py'))
hlo_bytes = importlib.util.module_from_spec(spec)
sys.modules['hlo_bytes'] = hlo_bytes
spec.loader.exec_module(hlo_bytes)


def test_untiled_shape_bytes():
    # plain row-major, no tiling: product * dtype size
    assert hlo_bytes.parse_shape_bytes('f32[2,3,4]{2,1,0}') == 96
    assert hlo_bytes.parse_shape_bytes('bf16[10]') == 20
    assert hlo_bytes.parse_shape_bytes('f32[]') == 4


def test_tuple_shape_bytes():
    s = '(f32[2,2]{1,0}, bf16[4]{0})'
    assert hlo_bytes.parse_shape_bytes(s) == 16 + 8


def test_tpu_tile_padding_f32():
    # f32 T(8,128): minor dim padded to 128, second-minor to 8
    got = hlo_bytes.parse_shape_bytes('f32[1,100,130]{2,1,0:T(8,128)}')
    assert got == 1 * 104 * 256 * 4


def test_tpu_tile_padding_bf16_subtile():
    # bf16 T(8,128)(2,1): effective sublane tile 16
    got = hlo_bytes.parse_shape_bytes('bf16[1,17,64]{2,1,0:T(8,128)(2,1)}')
    assert got == 1 * 32 * 128 * 2


def test_layout_permutation_applies_padding_to_physical_minor():
    # {1,0} vs {0,1}: tiling pads the PHYSICAL minor dims
    row = hlo_bytes.parse_shape_bytes('f32[2,100]{1,0:T(8,128)}')
    col = hlo_bytes.parse_shape_bytes('f32[2,100]{0,1:T(8,128)}')
    assert row == 8 * 128 * 4          # dims (2,100) -> pad (8,128)
    assert col == 104 * 128 * 4        # physical (100,2) -> pad (104,128)


def test_lane_padding_waste_case():
    # the GroupNorm hazard this tool was built to find: C/G=2 in the
    # minor dim costs 64x over a channel-last layout
    bad = hlo_bytes.parse_shape_bytes('f32[1,4096,32,2]{3,2,1,0:T(8,128)}')
    good = hlo_bytes.parse_shape_bytes('f32[1,4096,64]{2,1,0:T(8,128)}')
    logical = 1 * 4096 * 32 * 2 * 4
    assert bad == 1 * 4096 * 32 * 128 * 4     # 64x the logical bytes
    assert bad == 64 * logical
    # channel-last keeps the same elements at 2x padding (64 -> 128 lanes)
    assert bad // good == 32


def test_analyze_entry_attribution(capsys):
    hlo = """HloModule jit_f

%fused_add (p0: f32[4,128]) -> f32[4,128] {
  %p0 = f32[4,128]{1,0} parameter(0)
  ROOT %a = f32[4,128]{1,0} add(%p0, %p0), metadata={op_name="jit(f)/Model/layer/add"}
}

ENTRY %main (Arg_0.1: f32[4,128]) -> f32[4,128] {
  %Arg_0.1 = f32[4,128]{1,0} parameter(0)
  ROOT %fusion = f32[4,128]{1,0} fusion(%Arg_0.1), kind=kLoop, calls=%fused_add
}
"""
    total = hlo_bytes.analyze(hlo, top_n=5, scope_depth=2)
    out = capsys.readouterr().out
    # operand + output of the one real instruction
    assert total == 2 * 4 * 128 * 4
    # fusion with no call-site metadata inherits the body's op_name
    assert 'Model/layer' in out


def test_logical_bytes_ignore_tiling():
    # cost_analysis counts logical (unpadded) bytes; logical=True must
    # drop the tile padding but keep dtype/element math
    padded = hlo_bytes.parse_shape_bytes('f32[1,100,130]{2,1,0:T(8,128)}')
    logical = hlo_bytes.parse_shape_bytes('f32[1,100,130]{2,1,0:T(8,128)}',
                                          logical=True)
    assert padded == 1 * 104 * 256 * 4
    assert logical == 1 * 100 * 130 * 4


def test_pad_report_ranks_materialized_lane_waste(capsys):
    # a C=64 bf16 buffer is half a (8,128) lane tile: physical 2x logical.
    # The pad report must count ONLY materialized (ENTRY-level) outputs —
    # the decoder-tail padding-tax hypothesis rides on this arithmetic.
    hlo = '''
HloModule m

ENTRY %main {
  %p0 = bf16[1,64,64,64]{3,2,1,0:T(8,128)(2,1)} parameter(0)
  %t = bf16[1,64,64,64]{3,2,1,0:T(8,128)(2,1)} tanh(%p0), metadata={op_name="jit(f)/tail/tanh"}
  ROOT %r = bf16[1,64,64,128]{3,2,1,0:T(8,128)(2,1)} convolution(%t, %t), metadata={op_name="jit(f)/tail/conv"}
}
'''
    hlo_bytes.analyze(hlo, top_n=5)
    out = capsys.readouterr().out
    assert 'padding tax' in out
    # tanh out: logical 1*64*64*64*2 = 524288; physical pads C 64->128
    assert 'WASTE 0.00 GB' in out or 'WASTE' in out
    import re as _re
    m = _re.search(r'physical-minus-logical\s+WASTE (\d+\.\d+) GB', out)
    assert m
    # tanh wastes 0.5 MB, conv output is aligned (C=128) -> total 0.0005 GB
    line = [ln for ln in out.splitlines() if 'x) tanh' in ln]
    assert line, out
    assert '2.0x' in line[0]
