"""Driver-contract checks: entry() traces, dryrun config builds."""

import sys
from os import path as osp

import jax
import pytest

sys.path.insert(0, osp.join(osp.dirname(__file__), '..'))


def test_entry_traces_and_has_example_args():
    import __graft_entry__ as g
    fn, example_args = g.entry()
    # tracing (abstract lowering) validates the jaxpr without executing
    lowered = jax.jit(fn).lower(*example_args)
    out_shape = lowered.out_info
    assert lowered is not None
    del out_shape
