"""Learning-rate schedules as optax-compatible schedule functions.

Parity: /root/reference/basicsr/models/lr_scheduler.py (MultiStepRestartLR:
6-33, CosineAnnealingRestartLR:57-96), torch MultiStepLR, plus the linear
warmup applied by BaseModel.update_learning_rate (base_model.py:185-206).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax.numpy as jnp


def multi_step_lr(base_lr: float, milestones: Sequence[int],
                  gamma: float = 0.1) -> Callable:
    """torch MultiStepLR: lr = base * gamma^(#milestones passed)."""
    milestones = sorted(int(m) for m in milestones)

    def schedule(step):
        count = sum(jnp.asarray(step >= m, jnp.float32) for m in milestones)
        return base_lr * gamma ** count

    return schedule


def multi_step_restart_lr(base_lr: float, milestones: Sequence[int],
                          gamma: float = 0.1,
                          restarts: Sequence[int] = (0,),
                          restart_weights: Sequence[float] = (1,)) -> Callable:
    """MultiStepLR with restarts (lr_scheduler.py:6-33)."""
    assert len(restarts) == len(restart_weights), 'restarts and their weights need to match.'
    milestones = sorted(int(m) for m in milestones)
    restarts = [int(r) for r in restarts]

    def schedule(step):
        lr = base_lr
        # restart: reset to base_lr * weight at each restart iteration
        weight = 1.0
        last_restart = 0
        for r, w in zip(restarts, restart_weights):
            weight = jnp.where(step >= r, w, weight)
            last_restart = jnp.where(step >= r, r, last_restart)
        count = sum(
            jnp.asarray((step >= m) & (m > last_restart), jnp.float32)
            for m in milestones)
        return lr * weight * gamma ** count

    return schedule


def cosine_annealing_restart_lr(base_lr: float, periods: Sequence[int],
                                restart_weights: Sequence[float] = (1,),
                                eta_min: float = 0) -> Callable:
    """Cosine annealing with restarts (lr_scheduler.py:57-96)."""
    assert len(periods) == len(restart_weights), (
        'periods and restart_weights should have the same length.')
    cumulative = [sum(periods[0:i + 1]) for i in range(len(periods))]

    def schedule(step):
        # reference get_position_from_periods: the first i with
        # step <= cumulative[i]; boundaries belong to the EARLIER period
        lr = eta_min
        prev_cum = 0
        for i, cum in enumerate(cumulative):
            lo = -1 if i == 0 else prev_cum
            in_period = (step > lo) & (step <= cum)
            weight = restart_weights[i]
            period = periods[i]
            nearest = prev_cum if i > 0 else 0
            cur = eta_min + weight * 0.5 * (base_lr - eta_min) * (
                1 + jnp.cos(jnp.pi * ((step - nearest) / period)))
            lr = jnp.where(in_period, cur, lr)
            prev_cum = cum
        return lr

    return schedule


def with_warmup(schedule: Callable, warmup_iter: int,
                init_lr: Optional[float] = None) -> Callable:
    """Linear warmup over the first warmup_iter steps (base_model.py:185-206)."""
    if warmup_iter <= 0:
        return schedule

    def warmed(step):
        target = schedule(step)
        warm = target * (jnp.asarray(step, jnp.float32) / warmup_iter)
        return jnp.where(step < warmup_iter, warm, target)

    return warmed


def build_schedule(scheduler_opt: dict, base_lr: float,
                   warmup_iter: int = -1) -> Callable:
    """Build an lr schedule from the YAML `train.scheduler` dict."""
    opt = dict(scheduler_opt or {'type': 'MultiStepLR', 'milestones': [],
                                 'gamma': 1})
    stype = opt.pop('type')
    if stype == 'MultiStepLR':
        sched = multi_step_lr(base_lr, opt.get('milestones', []),
                              opt.get('gamma', 0.1))
    elif stype == 'MultiStepRestartLR':
        sched = multi_step_restart_lr(base_lr, opt.get('milestones', []),
                                      opt.get('gamma', 0.1),
                                      opt.get('restarts', [0]),
                                      opt.get('restart_weights', [1]))
    elif stype == 'CosineAnnealingRestartLR':
        sched = cosine_annealing_restart_lr(base_lr, opt['periods'],
                                            opt.get('restart_weights', [1]),
                                            opt.get('eta_min', 0))
    else:
        raise NotImplementedError(f'Scheduler {stype} is not implemented yet.')
    return with_warmup(sched, warmup_iter)
