"""FLOP / memory estimation via XLA cost analysis.

Parity: the reference's hand-written `flops()` estimators on Swin modules
(network_swinir.py:150-161, 285-297, 841-850). Instead of per-module
arithmetic, any jittable function is measured exactly from its compiled HLO.
"""

from __future__ import annotations

from typing import Any, Callable, Dict


def cost_analysis(fn: Callable, *args, **kwargs) -> Dict[str, float]:
    """Compile `fn(*args)` and return XLA's cost analysis (flops, bytes)."""
    import jax
    compiled = jax.jit(fn).lower(*args, **kwargs).compile()
    cost = compiled.cost_analysis() or {}
    return {k: float(v) for k, v in cost.items()
            if isinstance(v, (int, float))}


def model_flops(module, variables, *args, **kwargs) -> float:
    """Total FLOPs of one `module.apply(variables, *args)` forward."""
    def fwd(v, *a):
        return module.apply(v, *a, **kwargs)
    return cost_analysis(fwd, variables, *args).get('flops', float('nan'))
