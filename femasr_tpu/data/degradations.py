"""BSRGAN degradation synthesis — host (numpy/cv2) implementation.

Capability parity with /root/reference/basicsr/data/bsrgan_util.py:
kernel generators (anisotropic_Gaussian:214, gm_blur_kernel:236,
gen_kernel:295, fspecial:337-368), stage ops (add_blur:484, add_resize:498,
add_Gaussian_noise:512, add_speckle_noise:529, add_Poisson_noise:547,
add_JPEG_noise:561, add_sharpening:458), and the shuffled 7-op pipelines
(degradation_bsrgan:581, degradation_bsrgan_plus:672).

This host path feeds dataloader workers / offline dataset generation. The
TPU-native on-device variant lives in femasr_tpu/ops/degradations_jax.py.
"""

from __future__ import annotations

import math
import random
from typing import Optional, Tuple

import cv2
import numpy as np

from ..ops.resize import imresize_np


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def gaussian_pdf_grid(cov: np.ndarray, size: int) -> np.ndarray:
    """Evaluate a zero-mean 2D Gaussian pdf on the reference's kernel grid.

    Grid parity with gm_blur_kernel (bsrgan_util.py:236-246): coordinates
    (x - size/2 + 0.5) for x in [0, size).
    """
    center = size / 2.0 + 0.5
    coords = np.arange(size, dtype=np.float64) - center + 1
    xx, yy = np.meshgrid(coords, coords)  # xx: x (cols), yy: y (rows)
    pts = np.stack([xx, yy], axis=-1)
    inv = np.linalg.inv(cov)
    det = np.linalg.det(cov)
    quad = np.einsum('...i,ij,...j->...', pts, inv, pts)
    k = np.exp(-0.5 * quad) / (2 * np.pi * math.sqrt(det))
    return k / k.sum()


def anisotropic_gaussian_kernel(ksize: int = 15, theta: float = np.pi,
                                l1: float = 6, l2: float = 6) -> np.ndarray:
    """Rotated anisotropic Gaussian kernel (bsrgan_util.py:214-233)."""
    v = np.array([np.cos(theta), np.sin(theta)])
    V = np.array([[v[0], v[1]], [v[1], -v[0]]])
    D = np.array([[l1, 0.0], [0.0, l2]])
    cov = V @ D @ np.linalg.inv(V)
    return gaussian_pdf_grid(cov, ksize)


def fspecial_gaussian(hsize: int, sigma: float) -> np.ndarray:
    """MATLAB fspecial('gaussian') (bsrgan_util.py:337-348)."""
    siz = (hsize - 1.0) / 2.0
    y, x = np.mgrid[-siz:siz + 1, -siz:siz + 1]
    h = np.exp(-(x * x + y * y) / (2.0 * sigma * sigma))
    h[h < np.finfo(float).eps * h.max()] = 0
    s = h.sum()
    return h / s if s != 0 else h


def fspecial_laplacian(alpha: float) -> np.ndarray:
    alpha = max(0.0, min(alpha, 1.0))
    h1 = alpha / (alpha + 1)
    h2 = (1 - alpha) / (alpha + 1)
    return np.array([[h1, h2, h1], [h2, -4 / (alpha + 1), h2], [h1, h2, h1]])


def fspecial(filter_type: str, *args, **kwargs) -> np.ndarray:
    if filter_type == 'gaussian':
        return fspecial_gaussian(*args, **kwargs)
    if filter_type == 'laplacian':
        return fspecial_laplacian(*args, **kwargs)
    raise ValueError(filter_type)


def gen_kernel(k_size=(15, 15), scale_factor=(4, 4), min_var: float = 0.6,
               max_var: float = 10., noise_level: float = 0,
               rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """Random-covariance Gaussian kernel (bsrgan_util.py:295-334)."""
    rng = rng or np.random.default_rng()
    k_size = np.asarray(k_size)
    scale_factor = np.asarray(scale_factor)
    lambda_1 = min_var + rng.random() * (max_var - min_var)
    lambda_2 = min_var + rng.random() * (max_var - min_var)
    theta = rng.random() * np.pi
    noise = -noise_level + rng.random(tuple(k_size)) * noise_level * 2

    lam = np.diag([lambda_1, lambda_2])
    q = np.array([[np.cos(theta), -np.sin(theta)],
                  [np.sin(theta), np.cos(theta)]])
    sigma = q @ lam @ q.T
    inv_sigma = np.linalg.inv(sigma)

    mu = k_size // 2 - 0.5 * (scale_factor - 1)
    xx, yy = np.meshgrid(range(k_size[0]), range(k_size[1]))
    z = np.stack([xx, yy], -1).astype(np.float64) - mu
    quad = np.einsum('...i,ij,...j->...', z, inv_sigma, z)
    raw = np.exp(-0.5 * quad) * (1 + noise)
    return raw / raw.sum()


def shift_pixel(x: np.ndarray, sf: int, upper_left: bool = True) -> np.ndarray:
    """Sub-pixel shift by (sf-1)/2 with bilinear resampling (bsrgan_util.py:249-275)."""
    h, w = x.shape[:2]
    shift = (sf - 1) * 0.5
    xv = np.arange(w, dtype=np.float64)
    yv = np.arange(h, dtype=np.float64)
    x1 = np.clip(xv + shift if upper_left else xv - shift, 0, w - 1)
    y1 = np.clip(yv + shift if upper_left else yv - shift, 0, h - 1)

    def interp(plane):
        # separable linear interpolation on the grid (equiv. to interp2d linear)
        x0 = np.floor(x1).astype(int)
        xfrac = x1 - x0
        x0p = np.minimum(x0 + 1, w - 1)
        tmp = plane[:, x0] * (1 - xfrac) + plane[:, x0p] * xfrac
        y0 = np.floor(y1).astype(int)
        yfrac = (y1 - y0)[:, None]
        y0p = np.minimum(y0 + 1, h - 1)
        return tmp[y0] * (1 - yfrac) + tmp[y0p] * yfrac

    if x.ndim == 2:
        return interp(x)
    out = x.copy()
    for c in range(x.shape[-1]):
        out[:, :, c] = interp(x[:, :, c])
    return out


def filter2d_mirror(img: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    """Correlate? No — true convolution with mirror boundary, matching
    scipy.ndimage.convolve(img, k[..., None], mode='mirror')."""
    from scipy import ndimage
    return ndimage.convolve(img, kernel[:, :, None], mode='mirror')


# ---------------------------------------------------------------------------
# stage ops
# ---------------------------------------------------------------------------

def add_sharpening(img: np.ndarray, weight: float = 0.5, radius: int = 50,
                   threshold: int = 10) -> np.ndarray:
    """USM sharpening (bsrgan_util.py:458-481)."""
    if radius % 2 == 0:
        radius += 1
    blur = cv2.GaussianBlur(img, (radius, radius), 0)
    residual = img - blur
    mask = (np.abs(residual) * 255 > threshold).astype('float32')
    soft_mask = cv2.GaussianBlur(mask, (radius, radius), 0)
    sharp = np.clip(img + weight * residual, 0, 1)
    return soft_mask * sharp + (1 - soft_mask) * img


def add_blur(img: np.ndarray, sf: int = 4) -> np.ndarray:
    wd2 = 4.0 + sf
    wd = 2.0 + 0.2 * sf
    if random.random() < 0.5:
        k = anisotropic_gaussian_kernel(
            ksize=2 * random.randint(2, 11) + 3, theta=random.random() * np.pi,
            l1=wd2 * random.random(), l2=wd2 * random.random())
    else:
        k = fspecial('gaussian', 2 * random.randint(2, 11) + 3,
                     wd * random.random())
    return filter2d_mirror(img, k)


def add_resize(img: np.ndarray, sf: int = 4) -> np.ndarray:
    rnum = np.random.rand()
    if rnum > 0.8:
        sf1 = random.uniform(1, 2)
    elif rnum < 0.7:
        sf1 = random.uniform(0.5 / sf, 1)
    else:
        sf1 = 1.0
    img = cv2.resize(img, (int(sf1 * img.shape[1]), int(sf1 * img.shape[0])),
                     interpolation=random.choice([1, 2, 3]))
    return np.clip(img, 0.0, 1.0)


def add_gaussian_noise(img: np.ndarray, noise_level1: int = 2,
                       noise_level2: int = 25) -> np.ndarray:
    from scipy.linalg import orth
    noise_level = random.randint(noise_level1, noise_level2)
    rnum = np.random.rand()
    if rnum > 0.6:  # color
        img = img + np.random.normal(0, noise_level / 255.0,
                                     img.shape).astype(np.float32)
    elif rnum < 0.4:  # gray
        img = img + np.random.normal(0, noise_level / 255.0,
                                     (*img.shape[:2], 1)).astype(np.float32)
    else:  # channel-correlated
        ll = noise_level2 / 255.
        d = np.diag(np.random.rand(3))
        u = orth(np.random.rand(3, 3))
        cov = np.abs(ll ** 2 * (u.T @ d @ u))
        img = img + np.random.multivariate_normal(
            [0, 0, 0], cov, img.shape[:2]).astype(np.float32)
    return np.clip(img, 0.0, 1.0)


def add_speckle_noise(img: np.ndarray, noise_level1: int = 2,
                      noise_level2: int = 25) -> np.ndarray:
    from scipy.linalg import orth
    noise_level = random.randint(noise_level1, noise_level2)
    img = np.clip(img, 0.0, 1.0)
    rnum = random.random()
    if rnum > 0.6:
        img = img + img * np.random.normal(
            0, noise_level / 255.0, img.shape).astype(np.float32)
    elif rnum < 0.4:
        img = img + img * np.random.normal(
            0, noise_level / 255.0, (*img.shape[:2], 1)).astype(np.float32)
    else:
        ll = noise_level2 / 255.
        d = np.diag(np.random.rand(3))
        u = orth(np.random.rand(3, 3))
        cov = np.abs(ll ** 2 * (u.T @ d @ u))
        img = img + img * np.random.multivariate_normal(
            [0, 0, 0], cov, img.shape[:2]).astype(np.float32)
    return np.clip(img, 0.0, 1.0)


def add_poisson_noise(img: np.ndarray) -> np.ndarray:
    img = np.clip((img * 255.0).round(), 0, 255) / 255.
    vals = 10 ** (2 * random.random() + 2.0)
    if random.random() < 0.5:
        img = np.random.poisson(img * vals).astype(np.float32) / vals
    else:
        gray = img[..., :3] @ np.array([0.299, 0.587, 0.114])
        gray = np.clip((gray * 255.0).round(), 0, 255) / 255.
        noise_gray = (np.random.poisson(gray * vals).astype(np.float32) / vals
                      - gray)
        img = img + noise_gray[:, :, None]
    return np.clip(img, 0.0, 1.0)


def add_jpeg_noise(img: np.ndarray,
                   quality: Optional[int] = None) -> np.ndarray:
    """cv2/libjpeg round-trip with random quality in [30, 95]."""
    quality = quality if quality is not None else random.randint(30, 95)
    bgr = cv2.cvtColor((np.clip(img, 0, 1) * 255.0).round().astype(np.uint8),
                       cv2.COLOR_RGB2BGR)
    _, enc = cv2.imencode('.jpg', bgr, [int(cv2.IMWRITE_JPEG_QUALITY), quality])
    dec = cv2.imdecode(enc, 1)
    return cv2.cvtColor(dec, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0


def random_crop_pair(lq: np.ndarray, hq: np.ndarray, sf: int = 4,
                     lq_patchsize: int = 64) -> Tuple[np.ndarray, np.ndarray]:
    h, w = lq.shape[:2]
    rnd_h = random.randint(0, h - lq_patchsize)
    rnd_w = random.randint(0, w - lq_patchsize)
    lq = lq[rnd_h:rnd_h + lq_patchsize, rnd_w:rnd_w + lq_patchsize, :]
    hq = hq[rnd_h * sf:(rnd_h + lq_patchsize) * sf,
            rnd_w * sf:(rnd_w + lq_patchsize) * sf, :]
    return lq, hq


# ---------------------------------------------------------------------------
# pipelines
# ---------------------------------------------------------------------------

def degradation_bsrgan(img: np.ndarray, sf: int = 4, lq_patchsize: int = 72,
                       isp_model=None, use_crop: bool = True
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """BSRGAN random-shuffled 7-op degradation (bsrgan_util.py:581-669).

    img: HWC RGB [0,1]. Returns (lq, hq).
    """
    isp_prob, jpeg_prob, scale2_prob = 0.25, 0.9, 0.25
    sf_ori = sf

    h1, w1 = img.shape[:2]
    img = img.copy()[:w1 - w1 % sf, :h1 - h1 % sf, ...]  # (reference quirk:
    # h/w swapped in the mod-crop bounds — preserved for distribution parity)
    h, w = img.shape[:2]
    if h < lq_patchsize * sf or w < lq_patchsize * sf:
        raise ValueError(f'img size ({h1}X{w1}) is too small!')

    hq = img.copy()

    if sf == 4 and random.random() < scale2_prob:  # optional x2 pre-downsample
        if np.random.rand() < 0.5:
            img = cv2.resize(img, (int(img.shape[1] / 2), int(img.shape[0] / 2)),
                             interpolation=random.choice([1, 2, 3]))
        else:
            img = imresize_np(img, 1 / 2, True)
        img = np.clip(img, 0.0, 1.0)
        sf = 2

    shuffle_order = random.sample(range(7), 7)
    idx1, idx2 = shuffle_order.index(2), shuffle_order.index(3)
    if idx1 > idx2:  # keep the to-1/sf downsample after the random rescale
        shuffle_order[idx1], shuffle_order[idx2] = (shuffle_order[idx2],
                                                    shuffle_order[idx1])

    a, b = img.shape[1], img.shape[0]
    for i in shuffle_order:
        if i == 0 or i == 1:
            img = add_blur(img, sf=sf)
        elif i == 2:
            a, b = img.shape[1], img.shape[0]
            if random.random() < 0.75:
                sf1 = random.uniform(1, 2 * sf)
                img = cv2.resize(img, (int(img.shape[1] / sf1),
                                       int(img.shape[0] / sf1)),
                                 interpolation=random.choice([1, 2, 3]))
            else:
                k = fspecial('gaussian', 25, random.uniform(0.1, 0.6 * sf))
                k_shifted = shift_pixel(k, sf)
                k_shifted = k_shifted / k_shifted.sum()
                img = filter2d_mirror(img, k_shifted)
                img = img[0::sf, 0::sf, ...]
            img = np.clip(img, 0.0, 1.0)
        elif i == 3:
            img = cv2.resize(img, (int(a / sf), int(b / sf)),
                             interpolation=random.choice([1, 2, 3]))
            img = np.clip(img, 0.0, 1.0)
        elif i == 4:
            img = add_gaussian_noise(img, noise_level1=2, noise_level2=25)
        elif i == 5:
            if random.random() < jpeg_prob:
                img = add_jpeg_noise(img)
        elif i == 6:
            if random.random() < isp_prob and isp_model is not None:
                img, hq = isp_model.forward(img.copy(), hq)

    img = add_jpeg_noise(img)

    if use_crop:
        img, hq = random_crop_pair(img, hq, sf_ori, lq_patchsize)
    return img, hq


def degradation_bsrgan_plus(img: np.ndarray, sf: int = 4,
                            shuffle_prob: float = 0.5, use_sharp: bool = True,
                            lq_patchsize: int = 64, isp_model=None,
                            use_crop: bool = True
                            ) -> Tuple[np.ndarray, np.ndarray]:
    """BSRGAN+ 13-op hybrid pipeline for test-set synthesis
    (bsrgan_util.py:672-757)."""
    h1, w1 = img.shape[:2]
    img = img.copy()[:w1 - w1 % sf, :h1 - h1 % sf, ...]
    h, w = img.shape[:2]
    if h < lq_patchsize * sf or w < lq_patchsize * sf:
        raise ValueError(f'img size ({h1}X{w1}) is too small!')

    if use_sharp:
        img = add_sharpening(img)
    hq = img.copy()

    if random.random() < shuffle_prob:
        shuffle_order = random.sample(range(13), 13)
    else:
        shuffle_order = list(range(13))
        # local shuffle for noise operators
        shuffle_order[2:6] = random.sample(shuffle_order[2:6], len(range(2, 6)))
        shuffle_order[9:13] = random.sample(shuffle_order[9:13],
                                            len(range(9, 13)))
    poisson_prob, speckle_prob, isp_prob = 0.1, 0.1, 0.1

    for i in shuffle_order:
        if i == 0:
            img = add_blur(img, sf=sf)
        elif i == 1:
            img = add_resize(img, sf=sf)
        elif i == 2:
            img = add_gaussian_noise(img, noise_level1=2, noise_level2=25)
        elif i == 3:
            if random.random() < poisson_prob:
                img = add_poisson_noise(img)
        elif i == 4:
            if random.random() < speckle_prob:
                img = add_speckle_noise(img)
        elif i == 5:
            if random.random() < isp_prob and isp_model is not None:
                img, hq = isp_model.forward(img.copy(), hq)
        elif i == 6:
            img = add_jpeg_noise(img)
        elif i == 7:
            img = imresize_np(np.clip(img, 0, 1), 1 / sf, True)
            img = np.clip(img, 0.0, 1.0)
        elif i == 8:
            img = add_blur(img, sf=sf)
        elif i == 9:
            img = add_resize(img, sf=sf)
        elif i == 10:
            img = add_gaussian_noise(img, noise_level1=2, noise_level2=25)
        elif i == 11:
            if random.random() < poisson_prob:
                img = add_poisson_noise(img)
        elif i == 12:
            if random.random() < speckle_prob:
                img = add_speckle_noise(img)

    # resize to the desired LQ size if an op chain left it off-grid
    img = cv2.resize(img, (int(w / sf), int(h / sf)),
                     interpolation=random.choice([1, 2, 3]))
    img = add_jpeg_noise(img)

    if use_crop:
        img, hq = random_crop_pair(img, hq, sf, lq_patchsize)
    return img, hq
