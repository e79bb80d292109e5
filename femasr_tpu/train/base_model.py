"""Shared trainer facilities: best-metric tracking, checkpoint naming, EMA.

Capability parity with /root/reference/basicsr/models/base_model.py:
best-metric tracking (:50-83), EMA helper (:85-92), save_network/load_network
(:211-323, via utils.checkpoint msgpack), save_training_state/resume_training
(:325-373). Device placement/DDP-wrapping have no analogue — sharding is
handled by parallel/mesh.py + jit.
"""

from __future__ import annotations

import time
from os import path as osp
from typing import Any, Dict, Optional

import jax
import numpy as np

from ..utils.checkpoint import load_pytree, save_pytree, to_host
from ..utils.logger import get_root_logger


class BaseModel:
    """Base trainer: option handling, metric bookkeeping, checkpoint I/O."""

    def __init__(self, opt: dict):
        self.opt = opt
        self.is_train = opt.get('is_train', False)
        self.log_dict: Dict[str, float] = {}
        self.best_metric_results: Dict[str, Dict[str, Dict[str, Any]]] = {}

    def wrap_loader(self, loader):
        """Optionally wrap the train loader with a device prefetcher
        (models that stage batches on device override this; default is a
        pass-through). Called once by train_pipeline."""
        return loader

    # -- validation dispatch (base_model.py:36-48) --------------------------

    def validation(self, dataloader, current_iter, tb_logger, save_img=False,
                   save_as_dir=None):
        if self.opt.get('dist', False):
            self.dist_validation(dataloader, current_iter, tb_logger, save_img,
                                 save_as_dir)
        else:
            self.nondist_validation(dataloader, current_iter, tb_logger,
                                    save_img, save_as_dir)

    def dist_validation(self, *args, **kwargs):
        raise NotImplementedError

    def nondist_validation(self, *args, **kwargs):
        raise NotImplementedError

    # -- best-metric tracking (base_model.py:50-83) -------------------------

    def _initialize_best_metric_results(self, dataset_name: str):
        if dataset_name in self.best_metric_results:
            return
        record = {}
        for metric, content in self.opt['val']['metrics'].items():
            better = content.get('better', 'higher')
            init_val = float('-inf') if better == 'higher' else float('inf')
            record[metric] = {'better': better, 'val': init_val, 'iter': -1}
        self.best_metric_results[dataset_name] = record

    def _update_best_metric_result(self, dataset_name: str, metric: str,
                                   val: float, current_iter: int) -> bool:
        rec = self.best_metric_results[dataset_name][metric]
        improved = (val >= rec['val'] if rec['better'] == 'higher'
                    else val <= rec['val'])
        if improved:
            rec['val'] = val
            rec['iter'] = current_iter
        return improved

    def _update_metric_result(self, dataset_name, metric, val, current_iter):
        self.best_metric_results[dataset_name][metric]['val'] = val
        self.best_metric_results[dataset_name][metric]['iter'] = current_iter

    # -- EMA (base_model.py:85-92) -------------------------------------------

    @staticmethod
    def ema_update(ema_params, params, decay: float = 0.999):
        """EMA tree update; the single definition used both by callers and
        inside FeMaSRModel's jitted train step (params may be lower
        precision than the f32 EMA tree, hence the cast)."""
        return jax.tree.map(
            lambda e, p: e * decay + p.astype(e.dtype) * (1 - decay),
            ema_params, params)

    # -- checkpoint I/O ------------------------------------------------------

    def save_network(self, params: Any, net_label: str, current_iter,
                     param_key: str = 'params',
                     extra_keys: Optional[Dict[str, Any]] = None) -> None:
        """Save a network pytree as models/<label>_<iter>.ckpt.

        Retries the write 3x with a 1 s sleep before giving up with a
        warning (reference base_model.py:241-256 — "avoid occasional
        writing errors" on flaky shared filesystems). `extra_keys` adds
        sibling entries, e.g. {'params_ema': ...} (reference saves EMA
        weights alongside 'params' in the same file, base_model.py:211-239;
        load_network's params_ema->params fallback reads them back).
        """
        current_iter = 'latest' if current_iter == -1 else current_iter
        fname = f'{net_label}_{current_iter}.ckpt' if current_iter != '' \
            else f'{net_label}.ckpt'
        path = osp.join(self.opt['path']['models'], fname)
        tree = {param_key: to_host(params)}
        for k, v in (extra_keys or {}).items():
            tree[k] = to_host(v)
        self._save_with_retry(tree, path)

    @staticmethod
    def _save_with_retry(tree: Dict[str, Any], path: str,
                         retries: int = 3) -> None:
        for attempt in range(retries):
            try:
                save_pytree(tree, path)
                return
            except Exception as e:  # noqa: BLE001 — parity: swallow & retry
                get_root_logger().warning(
                    f'Save model error: {e}, remaining retry times: '
                    f'{retries - attempt - 1}')
                time.sleep(1)
        get_root_logger().warning(f'Still cannot save {path}. Just ignore it.')

    def load_network(self, path: str, param_key: Optional[str] = 'params'):
        """Load a network checkpoint (.ckpt msgpack or torch .pth).

        https:// paths are auto-downloaded into
        experiments/pretrained_models/ first (reference
        base_model.py:304-306).
        """
        logger = get_root_logger()
        if path.startswith(('https://', 'http://')):
            from ..utils.download_util import load_file_from_url
            model_dir = osp.join(
                self.opt.get('root_path', '.'),
                'experiments', 'pretrained_models')
            path = load_file_from_url(path, model_dir=model_dir)
        logger.info(f'Loading model from {path}')
        if path.endswith(('.pth', '.pt')):
            from ..models.convert import load_torch_checkpoint
            return load_torch_checkpoint(path, param_key)
        tree = load_pytree(path)
        if param_key:
            if param_key in tree:
                return tree[param_key]
            # reference parity (base_model.py:311-315): params_ema <-> params
            # fallback, logged; anything else missing is an error — silently
            # returning the whole multi-key tree would make merge_params
            # match nothing and keep init weights.
            for fallback in ('params', 'params_ema', 'tree'):
                if fallback != param_key and fallback in tree:
                    logger.info(
                        f'Loading: {param_key} does not exist, use {fallback}.')
                    return tree[fallback]
            # no wrapper key present -> treat as a bare param pytree
        return tree

    def save_training_state(self, state_tree: Dict[str, Any], epoch: int,
                            current_iter: int) -> None:
        """Save trainer state as training_states/<iter>.state."""
        if current_iter == -1:
            return
        state = {'epoch': epoch, 'iter': current_iter,
                 'state': to_host(state_tree)}
        path = osp.join(self.opt['path']['training_states'],
                        f'{current_iter}.state')
        self._save_with_retry(state, path)

    def resume_training_state(self, path: str) -> Dict[str, Any]:
        return load_pytree(path)

    def get_current_log(self) -> Dict[str, float]:
        return self.log_dict

    @staticmethod
    def reduce_loss_dict(loss_dict: Dict[str, Any]) -> Dict[str, float]:
        """Host-side scalar extraction. Under jit over the mesh the losses are
        already global means (the DDP reduce of base_model.py:375-400 is
        implicit in SPMD)."""
        return {k: float(np.asarray(v)) for k, v in loss_dict.items()}
