"""YAML option parsing with the same schema & CLI surface as the reference.

Parity target: /root/reference/basicsr/utils/options.py (parse_options:82-177,
force_yml overrides :117-128, debug-mode frequency rewrites :166-170,
`num_gpu: auto` :137-138, experiment dir layout :157-170, copy_opt_file
:180-194). Differences are deliberate and TPU-native:

- `--launcher` accepts `none|jax` (the reference's pytorch/slurm launchers are
  NCCL process-group bootstrap; on TPU, `jax.distributed.initialize()` is the
  equivalent and is invoked for the `jax` launcher).
- `num_gpu: auto` resolves to `jax.device_count()`.
- random seeding is `seed + jax.process_index()` (reference: seed + rank).
"""

from __future__ import annotations

import argparse
import os
import random
import sys
from collections import OrderedDict
from os import path as osp
from typing import Any, Optional

import yaml

from .misc import set_random_seed


# ---------------------------------------------------------------------------
# YAML load/dump preserving ordering (reference options.py:12-34)
# ---------------------------------------------------------------------------

def ordered_yaml():
    """Return (Loader, Dumper) that map YAML dicts to OrderedDict."""
    try:
        from yaml import CDumper as Dumper
        from yaml import CLoader as Loader
    except ImportError:
        from yaml import Dumper, Loader

    _mapping_tag = yaml.resolver.BaseResolver.DEFAULT_MAPPING_TAG

    def dict_representer(dumper, data):
        return dumper.represent_dict(data.items())

    def dict_constructor(loader, node):
        return OrderedDict(loader.construct_pairs(node))

    Dumper.add_representer(OrderedDict, dict_representer)
    Loader.add_constructor(_mapping_tag, dict_constructor)
    return Loader, Dumper


def yaml_load(f: str) -> Any:
    """Load YAML from a file path or a literal YAML string."""
    if os.path.isfile(f):
        with open(f, 'r') as fh:
            return yaml.load(fh, Loader=ordered_yaml()[0])
    return yaml.load(f, Loader=ordered_yaml()[0])


def dict2str(opt: dict, indent_level: int = 1) -> str:
    """Pretty-print nested option dict."""
    msg = '\n'
    for k, v in opt.items():
        if isinstance(v, dict):
            msg += ' ' * (indent_level * 2) + k + ':['
            msg += dict2str(v, indent_level + 1)
            msg += ' ' * (indent_level * 2) + ']\n'
        else:
            msg += ' ' * (indent_level * 2) + k + ': ' + str(v) + '\n'
    return msg


def _postprocess_yml_value(value: str) -> Any:
    """Parse a --force_yml value string into a python object."""
    if value == '~' or value.lower() == 'none':
        return None
    if value.lower() == 'true':
        return True
    if value.lower() == 'false':
        return False
    if value.startswith('['):
        return eval(value)  # noqa: S307 - same permissive semantics as reference CLI
    if value.isdigit():
        return int(value)
    try:
        return float(value)
    except ValueError:
        return value


def apply_force_yml(opt: dict, force_yml) -> None:
    """Apply `key:sub=val` dotted-path overrides (reference :117-128)."""
    if not force_yml:
        return
    for entry in force_yml:
        entry = entry.replace(' ', '')
        keys, value = entry.split('=', 1)
        value = _postprocess_yml_value(value)
        target = opt
        key_path = keys.split(':')
        for key in key_path[:-1]:
            target = target[key]
        target[key_path[-1]] = value


# ---------------------------------------------------------------------------
# parse_options
# ---------------------------------------------------------------------------

def parse_options(root_path: str,
                  is_train: bool = True,
                  argv: Optional[list] = None):
    """Parse CLI + YAML into the option dict. Returns (opt, args)."""
    parser = argparse.ArgumentParser()
    parser.add_argument('-opt', type=str, required=True,
                        help='Path to option YAML file.')
    parser.add_argument('--launcher', choices=['none', 'jax'], default='none',
                        help='distributed launcher (jax = multi-host TPU)')
    parser.add_argument('--auto_resume', action='store_true')
    parser.add_argument('--debug', action='store_true')
    parser.add_argument('--local_rank', type=int, default=0)
    parser.add_argument('--force_yml', nargs='+', action='append',
                        default=None,
                        help='Force to update yml files. Examples: '
                             'train:ema_decay=0.999. May be given once with '
                             'several entries (reference style) or repeated '
                             '(each occurrence accumulates, not overwrites)')
    args = parser.parse_args(argv)
    if args.force_yml is not None:  # flatten append-of-nargs lists
        args.force_yml = [e for group in args.force_yml for e in group]

    opt = yaml_load(args.opt)

    # distributed init: on TPU the process group is the JAX runtime itself.
    import jax
    if args.launcher == 'jax':
        try:
            jax.distributed.initialize()
        except Exception:  # single-process fallback (already initialized / no coordinator)
            pass
        opt['dist'] = jax.process_count() > 1
    else:
        opt['dist'] = False
    opt['rank'] = jax.process_index()
    opt['world_size'] = jax.process_count()

    # random seed (reference: seed + rank). NOTE exact reference parity:
    # the reference seeds BEFORE applying --force_yml (options.py:110-128),
    # so `--force_yml manual_seed=N` updates the archived opt but not the
    # already-seeded host RNGs there or here. The jitted train step uses
    # opt['manual_seed'] via jax.random keys, so device-side randomness
    # DOES honor the override.
    seed = opt.get('manual_seed')
    if seed is None:
        seed = random.randint(1, 10000)
        opt['manual_seed'] = seed
    set_random_seed(seed + opt['rank'])

    apply_force_yml(opt, args.force_yml)

    opt['auto_resume'] = args.auto_resume
    opt['is_train'] = is_train
    opt['root_path'] = root_path

    # debug setting
    if args.debug and not opt['name'].startswith('debug'):
        opt['name'] = 'debug_' + opt['name']

    # device count (reference `num_gpu: auto`)
    if opt.get('num_gpu', 'auto') == 'auto':
        opt['num_gpu'] = jax.device_count()

    # datasets: inject phase/scale, expand paths
    for phase, dataset in (opt.get('datasets') or {}).items():
        phase = phase.split('_')[0]
        dataset['phase'] = phase
        if 'scale' in opt:
            dataset['scale'] = opt['scale']
        if dataset.get('dataroot_gt') is not None:
            dataset['dataroot_gt'] = osp.expanduser(dataset['dataroot_gt'])
        if dataset.get('dataroot_lq') is not None:
            dataset['dataroot_lq'] = osp.expanduser(dataset['dataroot_lq'])

    # paths
    opt.setdefault('path', OrderedDict())
    for key, val in opt['path'].items():
        if (val is not None) and ('resume_state' in key or 'pretrain_network' in key):
            opt['path'][key] = osp.expanduser(val)

    if is_train:
        experiments_root = osp.join(root_path, 'experiments', opt['name'])
        opt['path']['experiments_root'] = experiments_root
        opt['path']['models'] = osp.join(experiments_root, 'models')
        opt['path']['training_states'] = osp.join(experiments_root, 'training_states')
        opt['path']['log'] = experiments_root
        opt['path']['visualization'] = osp.join(experiments_root, 'visualization')

        # debug mode: quick val/log/save frequencies (reference :166-170)
        if 'debug' in opt['name']:
            if 'val' in opt:
                opt['val']['val_freq'] = 8
            opt['logger']['print_freq'] = 1
            opt['logger']['save_checkpoint_freq'] = 8
    else:
        results_root = osp.join(root_path, 'results', opt['name'])
        opt['path']['results_root'] = results_root
        opt['path']['log'] = results_root
        opt['path']['visualization'] = osp.join(results_root, 'visualization')

    return opt, args


def copy_opt_file(opt_file: str, experiments_root: str) -> None:
    """Archive the option YAML (plus argv) into the experiment dir."""
    import time
    from shutil import copyfile
    cmd = ' '.join(sys.argv)
    filename = osp.join(experiments_root, osp.basename(opt_file))
    os.makedirs(experiments_root, exist_ok=True)
    copyfile(opt_file, filename)
    with open(filename, 'r+') as f:
        lines = f.readlines()
        lines.insert(0, f'# GENERATE TIME: {time.asctime()}\n# CMD:\n# {cmd}\n\n')
        f.seek(0)
        f.writelines(lines)
