"""Metric factory mirroring the reference's pyiqa.create_metric usage
(/root/reference/basicsr/models/femasr_model.py:27-34).

Returns callables `metric(sr_img, gt_img) -> float` over [0, 1] HWC RGB numpy
arrays. 'lpips' runs the native JAX LPIPS and requires converted weights.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import numpy as np

from ..utils.registry import METRIC_REGISTRY
from .psnr_ssim import calculate_psnr, calculate_ssim

METRIC_REGISTRY.register(calculate_psnr, name='psnr')
METRIC_REGISTRY.register(calculate_ssim, name='ssim')


class LPIPSMetric:
    def __init__(self, params):
        import jax
        import jax.numpy as jnp
        from ..losses.lpips import LPIPS
        self._model = LPIPS()
        self._params = params
        self._fn = jax.jit(
            lambda p, a, b: self._model.apply({'params': p}, a, b))
        self._jnp = jnp

    def __call__(self, img: np.ndarray, img2: np.ndarray, **kwargs) -> float:
        a = self._jnp.asarray(img, self._jnp.float32)[None]
        b = self._jnp.asarray(img2, self._jnp.float32)[None]
        return float(np.asarray(self._fn(self._params, a, b))[0])


def _niqe_metric(img: np.ndarray, img2: Optional[np.ndarray] = None,
                 pristine_params: str = '', **kwargs) -> float:
    """No-reference NIQE through the factory; `pristine_params` accepts any
    standard artifact — basicsr's niqe_pris_params.npz (canonical,
    literature-comparable), the MATLAB modelparameters.mat, or a local
    mu/cov .npz fit with metrics.niqe.fit_niqe_params. The unused img2
    keeps the (sr, gt) call signature."""
    if not pristine_params:
        raise ValueError(
            'niqe metric needs pristine_params: <path to '
            'niqe_pris_params.npz / modelparameters.mat / fitted mu-cov '
            '.npz> (fit with femasr_tpu.metrics.niqe.fit_niqe_params)')
    from .niqe import calculate_niqe, load_niqe_pris_params
    mu, cov, window = load_niqe_pris_params(pristine_params)
    return calculate_niqe(img, mu, cov, gaussian_window=window, **kwargs)


METRIC_REGISTRY.register(_niqe_metric, name='niqe')


def create_metric(name: str, lpips_params=None, **mopt) -> Optional[Callable]:
    """Build a metric function by name ('psnr' | 'ssim' | 'lpips' | 'niqe')."""
    if name == 'lpips':
        if lpips_params is None:
            return None
        return LPIPSMetric(lpips_params)
    fn = METRIC_REGISTRY.get(name)
    return functools.partial(fn, **mopt)
