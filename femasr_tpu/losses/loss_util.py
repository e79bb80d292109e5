"""Weighted-loss decorator (parity: /root/reference/basicsr/losses/loss_util.py:57-95)."""

from __future__ import annotations

import functools

import jax.numpy as jnp


def reduce_loss(loss, reduction: str):
    if reduction == 'none':
        return loss
    if reduction == 'mean':
        return jnp.mean(loss)
    if reduction == 'sum':
        return jnp.sum(loss)
    raise ValueError(f'invalid reduction: {reduction}')


def weight_reduce_loss(loss, weight=None, reduction: str = 'mean'):
    """Apply an elementwise weight, then reduce.

    Matches loss_util.py:25-54: with a weight and 'mean' reduction the sum is
    divided by the weight sum (a 1-channel weight counts once per channel).
    NHWC: channels are the last axis.
    """
    if weight is not None:
        loss = loss * weight
    if weight is None or reduction == 'sum':
        return reduce_loss(loss, reduction)
    if reduction == 'mean':
        denom = jnp.sum(weight)
        if weight.shape[-1] == 1 and loss.shape[-1] > 1:
            denom = denom * loss.shape[-1]
        return jnp.sum(loss) / denom
    return loss


def weighted_loss(loss_func):
    """Decorator adding (weight=None, reduction='mean') to an elementwise loss."""

    @functools.wraps(loss_func)
    def wrapper(pred, target, weight=None, reduction='mean', **kwargs):
        loss = loss_func(pred, target, **kwargs)
        return weight_reduce_loss(loss, weight, reduction)

    return wrapper
