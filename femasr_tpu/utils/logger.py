"""Logging / observability: root logger, message logger with ETA, timers.

Parity target: /root/reference/basicsr/utils/logger.py (AvgTimer:10,
MessageLogger:45, init_tb_logger:118, init_wandb_logger:125,
get_root_logger:146, get_env_info:188). Rank gating uses
`jax.process_index()` instead of torch.distributed rank.
"""

from __future__ import annotations

import datetime
import logging
import time
from typing import Optional

initialized_logger = {}


class AvgTimer:
    """Windowed average timer for iter/data timing (reference logger.py:10-42)."""

    def __init__(self, window: int = 200):
        self.window = window
        self.current_time = 0.
        self.total_time = 0.
        self.count = 0
        self.avg_time = 0.
        self.start()

    def start(self) -> None:
        self.start_time = self.tic = time.time()

    def record(self, steps: int = 1) -> None:
        """Record one measured interval covering `steps` logical
        iterations (steps > 1: a chained multi-step dispatch — the
        interval is attributed per-step so get_avg_time() stays a
        per-iteration number)."""
        self.count += steps
        self.toc = time.time()
        self.current_time = (self.toc - self.tic) / steps
        self.total_time += self.toc - self.tic
        self.avg_time = self.total_time / self.count
        if self.count > self.window:
            self.count = 0
            self.total_time = 0
        self.tic = time.time()

    def get_current_time(self) -> float:
        return self.current_time

    def get_avg_time(self) -> float:
        return self.avg_time


class MessageLogger:
    """Format training-iter log lines with ETA; mirror `l_*` keys to TB.

    Reference: logger.py:45-115.
    """

    def __init__(self, opt: dict, start_iter: int = 1, tb_logger=None):
        self.exp_name = opt['name']
        self.interval = opt['logger']['print_freq']
        self.start_iter = start_iter
        self.max_iters = opt['train']['total_iter']
        self.use_tb_logger = opt['logger'].get('use_tb_logger', False)
        self.tb_logger = tb_logger
        self.start_time = time.time()
        self.logger = get_root_logger()

    def reset_start_time(self) -> None:
        self.start_time = time.time()

    def __call__(self, log_vars: dict) -> None:
        current_iter = log_vars.pop('iter')
        epoch = log_vars.pop('epoch', 0)
        lrs = log_vars.pop('lrs', [])

        message = (f'[{self.exp_name[:5]}..][epoch:{epoch:3d}, iter:{current_iter:8,d}, lr:(')
        for v in lrs:
            message += f'{v:.3e},'
        message += ')] '

        # time / ETA
        if 'time' in log_vars.keys():
            iter_time = log_vars.pop('time')
            data_time = log_vars.pop('data_time', 0.)
            total_time = time.time() - self.start_time
            time_sec_avg = total_time / max(current_iter - self.start_iter + 1, 1)
            eta_sec = time_sec_avg * (self.max_iters - current_iter - 1)
            eta_str = str(datetime.timedelta(seconds=int(eta_sec)))
            message += f'[eta: {eta_str}, '
            message += f'time (data): {iter_time:.3f} ({data_time:.3f})] '

        for k, v in log_vars.items():
            message += f'{k}: {v:.4e} '
            if self.use_tb_logger and self.tb_logger is not None and 'debug' not in self.exp_name:
                label = f'losses/{k}' if k.startswith('l_') else k
                self.tb_logger.add_scalar(label, v, current_iter)
        self.logger.info(message)


def init_tb_logger(log_dir: str):
    from torch.utils.tensorboard import SummaryWriter
    return SummaryWriter(log_dir=log_dir)


def init_wandb_logger(opt: dict):
    """Optional wandb in tensorboard-sync mode (reference logger.py:125-143)."""
    try:
        import wandb
    except ImportError:
        get_root_logger().warning('wandb is not installed; skipping wandb logger.')
        return
    logger = get_root_logger()
    project = opt['logger']['wandb']['project']
    resume_id = opt['logger']['wandb'].get('resume_id')
    if resume_id:
        wandb_id = resume_id
        resume = 'allow'
        logger.warning(f'Resume wandb logger with id={wandb_id}.')
    else:
        wandb_id = wandb.util.generate_id()
        resume = 'never'
    wandb.init(id=wandb_id, resume=resume, name=opt['name'], config=opt,
               project=project, sync_tensorboard=True)
    logger.info(f'Use wandb logger with id={wandb_id}; project={project}.')


def get_root_logger(logger_name: str = 'femasr_tpu',
                    log_level: int = logging.INFO,
                    log_file: Optional[str] = None) -> logging.Logger:
    """Root logger; non-zero JAX processes are silenced to ERROR."""
    logger = logging.getLogger(logger_name)
    if logger_name in initialized_logger:
        return logger

    format_str = '%(asctime)s %(levelname)s: %(message)s'
    stream_handler = logging.StreamHandler()
    stream_handler.setFormatter(logging.Formatter(format_str))
    logger.addHandler(stream_handler)
    logger.propagate = False

    try:
        import jax
        rank = jax.process_index()
    except Exception:
        rank = 0
    if rank != 0:
        logger.setLevel('ERROR')
    elif log_file is not None:
        logger.setLevel(log_level)
        file_handler = logging.FileHandler(log_file, 'w')
        file_handler.setFormatter(logging.Formatter(format_str))
        file_handler.setLevel(log_level)
        logger.addHandler(file_handler)
    else:
        logger.setLevel(log_level)
    initialized_logger[logger_name] = True
    return logger


def get_env_info() -> str:
    import jax
    import jaxlib
    msg = ('\nVersion Information: '
           f'\n\tjax: {jax.__version__}'
           f'\n\tjaxlib: {jaxlib.__version__}'
           f'\n\tdevices: {[str(d) for d in jax.devices()]}'
           f'\n\tprocess: {jax.process_index()}/{jax.process_count()}')
    return msg
