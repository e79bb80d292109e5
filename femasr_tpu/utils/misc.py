"""Misc utilities: seeding, directory management, file scanning, resume checks.

Parity with /root/reference/basicsr/utils/misc.py (set_random_seed:11,
mkdir_and_rename:24, make_exp_dirs:37, scandir:52, check_resume:94) with
JAX-first RNG semantics: `set_random_seed` seeds the host-side RNGs (python /
numpy) used by the data pipeline, and `new_rng` hands out `jax.random` keys for
device-side randomness (degradation ops, parameter init).
"""

from __future__ import annotations

import os
import random
import time
from os import path as osp
from typing import Iterator, Optional

import numpy as np


def set_random_seed(seed: int) -> None:
    """Seed host-side RNGs (python, numpy). Device RNG uses explicit keys."""
    random.seed(seed)
    np.random.seed(seed)


def new_rng(seed: int):
    """Create a root `jax.random` key (lazy jax import keeps CLI start fast)."""
    import jax
    return jax.random.PRNGKey(seed)


def get_time_str() -> str:
    return time.strftime('%Y%m%d_%H%M%S', time.localtime())


def mkdir_and_rename(path: str) -> None:
    """mkdir; if the dir exists, archive it with a timestamp suffix first."""
    if osp.exists(path):
        new_name = path + '_archived_' + get_time_str()
        print(f'Path already exists. Rename it to {new_name}', flush=True)
        os.rename(path, new_name)
    os.makedirs(path, exist_ok=True)


def make_exp_dirs(opt: dict) -> None:
    """Create experiment directories (experiments/<name>/{models,...})."""
    path_opt = dict(opt['path'])
    if opt.get('is_train', False):
        mkdir_and_rename(path_opt.pop('experiments_root'))
    else:
        mkdir_and_rename(path_opt.pop('results_root'))
    for key, p in path_opt.items():
        # 'pretrain' (not just 'pretrain_network') also covers our
        # pretrain_lpips / pretrain_vgg weight-file keys — mkdir'ing a
        # weight FILE path breaks test.py (caught by run_parity_suite
        # --dryrun config 5)
        if ('strict_load' in key or 'pretrain' in key
                or 'resume' in key or 'param_key' in key or p is None):
            continue
        os.makedirs(p, exist_ok=True)


def scandir(dir_path: str,
            suffix: Optional[str | tuple] = None,
            recursive: bool = False,
            full_path: bool = False) -> Iterator[str]:
    """Scan a directory for files with a given suffix, optionally recursive."""
    if (suffix is not None) and not isinstance(suffix, (str, tuple)):
        raise TypeError('"suffix" must be a string or tuple of strings')
    root = dir_path

    def _scandir(dir_path, suffix, recursive):
        for entry in os.scandir(dir_path):
            if not entry.name.startswith('.') and entry.is_file():
                rel = entry.path if full_path else osp.relpath(entry.path, root)
                if suffix is None or rel.endswith(suffix):
                    yield rel
            elif recursive and entry.is_dir():
                yield from _scandir(entry.path, suffix, recursive)

    return _scandir(dir_path, suffix, recursive)


IMG_EXTENSIONS = ('.jpg', '.JPG', '.jpeg', '.JPEG', '.png', '.PNG', '.ppm',
                  '.PPM', '.bmp', '.BMP', '.tif', '.TIF', '.tiff', '.TIFF',
                  '.webp', '.WEBP')


def is_image_file(filename: str) -> bool:
    return filename.endswith(IMG_EXTENSIONS)


def sizeof_fmt(size: float, suffix: str = 'B') -> str:
    for unit in ['', 'K', 'M', 'G', 'T', 'P', 'E', 'Z']:
        if abs(size) < 1024.0:
            return f'{size:3.1f} {unit}{suffix}'
        size /= 1024.0
    return f'{size:3.1f} Y{suffix}'


def check_resume(opt: dict, resume_iter: int) -> None:
    """Rewrite pretrain paths to the resume-iteration checkpoints.

    Mirrors the reference semantics (misc.py:94-124): when resuming, any
    configured `pretrain_network_*` entries are overridden to point at the
    checkpoints saved at `resume_iter`.
    """
    if not opt['path'].get('resume_state'):
        return
    networks = [key for key in opt.keys() if key.startswith('network_')]
    flag_pretrain = any(
        opt['path'].get(f'pretrain_{network}') is not None for network in networks)
    if flag_pretrain:
        print('pretrain_network paths will be ignored during resuming.', flush=True)
    for network in networks:
        name = f'pretrain_{network}'
        basename = network.replace('network_', '')
        if opt['path'].get('ignore_resume_networks') is None or (
                network not in opt['path']['ignore_resume_networks']):
            opt['path'][name] = osp.join(opt['path']['models'],
                                         f'net_{basename}_{resume_iter}.ckpt')
            print(f'Set {name} to {opt["path"][name]}', flush=True)
