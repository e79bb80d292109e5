"""Trainer layer (MODEL_REGISTRY) + factory.

Parity: /root/reference/basicsr/models/__init__.py:19-30 (build_model).
"""

from copy import deepcopy

from ..utils.registry import MODEL_REGISTRY
from .base_model import BaseModel
from .femasr_model import FeMaSRModel, TrainState
from .lr_scheduler import (build_schedule, cosine_annealing_restart_lr,
                           multi_step_lr, multi_step_restart_lr, with_warmup)

__all__ = ['build_model', 'BaseModel', 'FeMaSRModel', 'TrainState',
           'build_schedule', 'multi_step_lr', 'multi_step_restart_lr',
           'cosine_annealing_restart_lr', 'with_warmup']


def build_model(opt):
    """Instantiate a trainer model from the full option dict."""
    model = MODEL_REGISTRY.get(opt['model_type'])(deepcopy(opt))
    return model
