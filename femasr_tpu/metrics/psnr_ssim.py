"""PSNR / SSIM quality metrics (numpy host implementation).

Capability parity with the reference's pyiqa metric usage
(/root/reference/basicsr/models/femasr_model.py:27-34 with
options/train_FeMaSR_LQ_stage.yml:124-135: crop_border, test_y_channel) and
the vestigial scripts/metrics/calculate_psnr_ssim.py (which imports a missing
basicsr.metrics in the reference — implemented properly here).

Conventions match the standard BasicSR/pyiqa definitions: images in [0, 1]
(HWC RGB), optional MATLAB Y-channel conversion, border cropping, SSIM with
an 11x11 Gaussian window (sigma 1.5) on [0, 255]-scaled values.
"""

from __future__ import annotations

import cv2
import numpy as np

from ..utils.matlab_functions import rgb2ycbcr


def _prepare(img: np.ndarray, crop_border: int, test_y_channel: bool
             ) -> np.ndarray:
    img = np.asarray(img, np.float64)
    if img.ndim == 3 and img.shape[2] == 3 and test_y_channel:
        img = rgb2ycbcr(img.astype(np.float32), y_only=True).astype(np.float64)
    if crop_border != 0:
        img = img[crop_border:-crop_border, crop_border:-crop_border, ...]
    return img * 255.0


def calculate_psnr(img: np.ndarray, img2: np.ndarray, crop_border: int = 0,
                   test_y_channel: bool = False, **kwargs) -> float:
    """PSNR in dB between two [0, 1] HWC RGB (or HW) images."""
    assert img.shape == img2.shape, f'shapes differ: {img.shape} vs {img2.shape}'
    a = _prepare(img, crop_border, test_y_channel)
    b = _prepare(img2, crop_border, test_y_channel)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float('inf')
    return 10.0 * np.log10(255.0 * 255.0 / mse)


def _ssim_single(a: np.ndarray, b: np.ndarray) -> float:
    """SSIM for one channel on [0,255] float64, 11x11 Gaussian window."""
    c1 = (0.01 * 255) ** 2
    c2 = (0.03 * 255) ** 2
    kernel = cv2.getGaussianKernel(11, 1.5)
    window = np.outer(kernel, kernel.transpose())

    mu1 = cv2.filter2D(a, -1, window)[5:-5, 5:-5]
    mu2 = cv2.filter2D(b, -1, window)[5:-5, 5:-5]
    mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    sigma1_sq = cv2.filter2D(a ** 2, -1, window)[5:-5, 5:-5] - mu1_sq
    sigma2_sq = cv2.filter2D(b ** 2, -1, window)[5:-5, 5:-5] - mu2_sq
    sigma12 = cv2.filter2D(a * b, -1, window)[5:-5, 5:-5] - mu1_mu2

    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))
    return float(ssim_map.mean())


def calculate_ssim(img: np.ndarray, img2: np.ndarray, crop_border: int = 0,
                   test_y_channel: bool = False, **kwargs) -> float:
    """SSIM between two [0, 1] HWC RGB (or HW) images."""
    assert img.shape == img2.shape, f'shapes differ: {img.shape} vs {img2.shape}'
    a = _prepare(img, crop_border, test_y_channel)
    b = _prepare(img2, crop_border, test_y_channel)
    if a.ndim == 2:
        return _ssim_single(a, b)
    return float(np.mean([_ssim_single(a[..., c], b[..., c])
                          for c in range(a.shape[2])]))
