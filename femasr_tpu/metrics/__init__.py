from .psnr_ssim import calculate_psnr, calculate_ssim
from .metric_util import create_metric

__all__ = ['calculate_psnr', 'calculate_ssim', 'create_metric']
