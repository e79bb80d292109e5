"""Loss factory (parity: /root/reference/basicsr/losses/__init__.py:14-26)."""

from copy import deepcopy

from ..utils.registry import LOSS_REGISTRY
from .losses import (CharbonnierLoss, GANFeatLoss, GANLoss, L1Loss, LPIPSLoss,
                     MSELoss, MultiScaleGANLoss, PerceptualLoss,
                     WeightedTVLoss, charbonnier_loss, g_path_regularize,
                     gradient_penalty_loss, l1_loss, mse_loss, r1_penalty)
from .lpips import LPIPS, convert_lpips_checkpoint

__all__ = [
    'build_loss', 'L1Loss', 'MSELoss', 'CharbonnierLoss', 'WeightedTVLoss',
    'LPIPSLoss', 'PerceptualLoss', 'GANLoss', 'MultiScaleGANLoss',
    'GANFeatLoss', 'l1_loss', 'mse_loss', 'charbonnier_loss', 'r1_penalty',
    'g_path_regularize', 'gradient_penalty_loss', 'LPIPS',
    'convert_lpips_checkpoint',
]


def build_loss(opt):
    """Instantiate a loss from a YAML dict with a `type` key."""
    opt = deepcopy(dict(opt))
    loss_type = opt.pop('type')
    loss = LOSS_REGISTRY.get(loss_type)(**opt)
    return loss
