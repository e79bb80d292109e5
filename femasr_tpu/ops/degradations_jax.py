"""On-device (jittable) BSRGAN degradation synthesis.

TPU-native re-design of the reference's CPU degradation pipeline
(/root/reference/basicsr/data/bsrgan_util.py:581-669 degradation_bsrgan):
the reference shuffles 7 numpy/cv2/scipy ops across 8 dataloader worker
processes per GPU — the CPU hot loop of HQ-stage training. Here the whole
pipeline is ONE jitted, batched program on TPU: per-sample random Gaussian
kernels built in closed form, blur as batched depthwise conv, rescaling as
precomputed resize-matrix matmuls, noise from jax.random, and JPEG via the
DCT-quantization diffjpeg op with per-sample quality.

Static-shape adaptations (documented deltas from the reference):
- The reference changes image size mid-pipeline (random rescale, optional x2
  pre-downsample) and finishes at H/sf. Under XLA every op keeps the full
  canvas: rescale ops are down->up canvas round-trips (same low-pass /
  aliasing character), and the single true downsample to H/sf happens at the
  end, before the final JPEG. Distribution is close but not bit-identical.
- Random op ORDER is preserved: a traced permutation drives a lax.scan whose
  body lax.switches over the op set, with the reference's
  "rescale-before-final-downsample" constraint enforced by a conditional
  swap (bsrgan_util.py:615-618).
- cv2's nearest/bilinear/bicubic interpolation choice (random.choice([1,2,3]))
  maps to a lax.switch over bilinear / MATLAB-bicubic / area resize matrices.
- camera ISP stage (isp_model, p=0.25) is a no-op, as in the reference's
  released configs (isp_model=None).
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .diffjpeg import jpeg_compress
from .resize import matlab_resize_matrix

CANVAS_SCALES = (0.25, 0.375, 0.5, 0.625, 0.75, 0.875)
MAX_KSIZE = 25


def _as_fast_key(key: jax.Array) -> jax.Array:
    """Re-wrap an incoming (threefry) PRNG key as an 'rbg' key.

    The pipeline makes ~30 tiny random draws per step (op order, kernel
    params, qualities, probabilities). Each threefry draw lowers to a
    ~25-instruction scalar hash chain; inside the jitted train step these
    serialize (measured 2026-08-17: ~1.5K xor/shift/or entry instructions
    in the b8 step HLO). The 'rbg' impl lowers every draw to ONE
    RngBitGenerator instruction on TPU. Only the stream changes, never
    the distributions — degradation randomness is a distribution spec,
    not a bit spec (tests/test_degradations_jax.py is statistical).
    """
    if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
        data = jax.random.key_data(key)
    else:
        data = key
    data = jnp.asarray(data, jnp.uint32).reshape(-1)
    reps = -(-4 // data.shape[0])
    return jax.random.wrap_key_data(jnp.tile(data, reps)[:4], impl='rbg')


# ---------------------------------------------------------------------------
# kernels (closed-form, batched, on device)
# ---------------------------------------------------------------------------

def _kernel_grid(ksize: int) -> jax.Array:
    coords = jnp.arange(ksize, dtype=jnp.float32) - (ksize // 2)
    xx, yy = jnp.meshgrid(coords, coords)
    return xx, yy


def random_gaussian_kernels(key: jax.Array, batch: int, sf: int,
                            ksize: int = MAX_KSIZE) -> jax.Array:
    """Per-sample random blur kernels, (B, k, k), normalized.

    Mirrors add_blur (bsrgan_util.py:484-495): 50% anisotropic with
    l1, l2 ~ U(0, 4+sf), theta ~ U(0, pi); 50% isotropic with
    sigma ~ U(0, (2+0.2sf)); random truncation radius in [3.5, 12.5]
    emulating the random odd kernel sizes 7..25.
    """
    k_aniso, k_theta, k_l, k_sigma, k_mode, k_rad = jax.random.split(key, 6)
    wd2 = 4.0 + sf
    wd = 2.0 + 0.2 * sf

    theta = jax.random.uniform(k_theta, (batch,)) * jnp.pi
    l12 = jax.random.uniform(k_l, (batch, 2)) * wd2
    sigma = jax.random.uniform(k_sigma, (batch,)) * wd
    use_aniso = jax.random.uniform(k_mode, (batch,)) < 0.5
    radius = jax.random.randint(k_rad, (batch,), 2, 12).astype(
        jnp.float32) + 1.5  # matches ksize = 2*randint(2,11)+3

    xx, yy = _kernel_grid(ksize)

    def one(theta_i, l_i, sigma_i, aniso_i, radius_i):
        c, s = jnp.cos(theta_i), jnp.sin(theta_i)
        # inverse covariance of the rotated anisotropic Gaussian
        l1 = jnp.maximum(l_i[0], 1e-3)
        l2 = jnp.maximum(l_i[1], 1e-3)
        inv_a = (c * c / l1 + s * s / l2)
        inv_b = (c * s / l1 - c * s / l2)
        inv_d = (s * s / l1 + c * c / l2)
        quad_aniso = inv_a * xx * xx + 2 * inv_b * xx * yy + inv_d * yy * yy
        sig2 = jnp.maximum(sigma_i, 1e-3) ** 2
        quad_iso = (xx * xx + yy * yy) / sig2
        quad = jnp.where(aniso_i, quad_aniso, quad_iso)
        k = jnp.exp(-0.5 * quad)
        mask = (jnp.abs(xx) <= radius_i) & (jnp.abs(yy) <= radius_i)
        k = k * mask
        return k / jnp.sum(k)

    return jax.vmap(one)(theta, l12, sigma, use_aniso, radius)


def depthwise_blur(x: jax.Array, kernels: jax.Array) -> jax.Array:
    """Blur (B, H, W, C) with per-sample (B, k, k) kernels, mirror boundary."""
    b, h, w, c = x.shape
    k = kernels.shape[-1]
    p = k // 2
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode='reflect')
    # fold batch into channels for per-sample depthwise conv
    xp = xp.transpose(1, 2, 0, 3).reshape(1, h + 2 * p, w + 2 * p, b * c)
    rhs = jnp.repeat(kernels[:, :, :, None], c, axis=3)  # (B, k, k, C)
    rhs = rhs.transpose(1, 2, 0, 3).reshape(k, k, 1, b * c)
    # cross-correlation == convolution here (kernels are centrosymmetric in
    # the isotropic case; for anisotropic, flip to match true convolution)
    rhs = rhs[::-1, ::-1]
    out = jax.lax.conv_general_dilated(
        xp, rhs, window_strides=(1, 1), padding='VALID',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        feature_group_count=b * c)
    return out.reshape(h, w, b, c).transpose(2, 0, 1, 3)


# ---------------------------------------------------------------------------
# resize ops (precomputed matrices; lax.switch over interp methods)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _area_matrix(in_len: int, out_len: int) -> np.ndarray:
    """cv2 INTER_AREA-style averaging matrix (out, in)."""
    mat = np.zeros((out_len, in_len), np.float32)
    ratio = in_len / out_len
    for o in range(out_len):
        lo, hi = o * ratio, (o + 1) * ratio
        i0, i1 = int(math.floor(lo)), int(math.ceil(hi))
        for i in range(i0, min(i1, in_len)):
            overlap = min(hi, i + 1) - max(lo, i)
            mat[o, i] = overlap
        mat[o] /= mat[o].sum()
    return mat


@functools.lru_cache(maxsize=None)
def _bilinear_matrix(in_len: int, out_len: int) -> np.ndarray:
    """Half-pixel bilinear resize matrix (out, in) (cv2 INTER_LINEAR)."""
    mat = np.zeros((out_len, in_len), np.float32)
    scale = in_len / out_len
    for o in range(out_len):
        src = (o + 0.5) * scale - 0.5
        i0 = int(math.floor(src))
        frac = src - i0
        ia = min(max(i0, 0), in_len - 1)
        ib = min(max(i0 + 1, 0), in_len - 1)
        mat[o, ia] += 1 - frac
        mat[o, ib] += frac
    return mat


def _resize_with(mat_h: np.ndarray, mat_w: np.ndarray, x: jax.Array
                 ) -> jax.Array:
    out = jnp.einsum('oh,bhwc->bowc', jnp.asarray(mat_h), x)
    return jnp.einsum('pw,bowc->bopc', jnp.asarray(mat_w), out)


def resize_branches(h: int, w: int, oh: int, ow: int):
    """[bilinear, bicubic(matlab), area] resize fns (B,h,w,C)->(B,oh,ow,C)."""
    def bilinear(x):
        return _resize_with(_bilinear_matrix(h, oh), _bilinear_matrix(w, ow), x)

    def bicubic(x):
        return _resize_with(matlab_resize_matrix(h, oh, oh / h),
                            matlab_resize_matrix(w, ow, ow / w), x)

    def area(x):
        if oh >= h:  # area upscale degenerates to bilinear
            return bilinear(x)
        return _resize_with(_area_matrix(h, oh), _area_matrix(w, ow), x)

    return [bilinear, bicubic, area]


def canvas_rescale(x: jax.Array, scale: float, method: jax.Array) -> jax.Array:
    """Down->up canvas round-trip at `scale` with a traced interp choice."""
    b, h, w, c = x.shape
    oh, ow = max(int(round(h * scale)), 8), max(int(round(w * scale)), 8)
    down = jax.lax.switch(method, resize_branches(h, w, oh, ow), x)
    up = jax.lax.switch(method, resize_branches(oh, ow, h, w), down)
    return jnp.clip(up, 0.0, 1.0)


# ---------------------------------------------------------------------------
# noise ops
# ---------------------------------------------------------------------------

def add_gaussian_noise_jax(key: jax.Array, x: jax.Array,
                           noise_level1: float = 2.0,
                           noise_level2: float = 25.0) -> jax.Array:
    """3-mode Gaussian noise (color / gray / channel-correlated)
    (bsrgan_util.py:512-526), per-sample mode selection."""
    b, h, w, c = x.shape
    k_lvl, k_mode, k_n1, k_n2, k_cov, k_q = jax.random.split(key, 6)
    level = jax.random.randint(k_lvl, (b, 1, 1, 1), int(noise_level1),
                               int(noise_level2) + 1).astype(jnp.float32) / 255.
    mode = jax.random.uniform(k_mode, (b, 1, 1, 1))

    color = jax.random.normal(k_n1, x.shape) * level
    gray = jax.random.normal(k_n2, (b, h, w, 1)) * level

    # channel-correlated: cov = |L^2 U^T D U| via QR-orthogonalized U
    ll = noise_level2 / 255.
    u, _ = jnp.linalg.qr(jax.random.uniform(k_cov, (b, 3, 3)))
    d = jax.vmap(jnp.diag)(jax.random.uniform(k_q, (b, 3)))
    cov = jnp.abs(ll ** 2 * jnp.einsum('bij,bjk,bkl->bil',
                                       u.transpose(0, 2, 1), d, u))
    chol = jnp.linalg.cholesky(cov + 1e-12 * jnp.eye(3))
    corr = jnp.einsum('bhwc,bdc->bhwd', jax.random.normal(k_n1, x.shape), chol)

    noise = jnp.where(mode > 0.6, color, jnp.where(mode < 0.4, gray, corr))
    return jnp.clip(x + noise, 0.0, 1.0)


def add_speckle_noise_jax(key: jax.Array, x: jax.Array,
                          noise_level1: float = 2.0,
                          noise_level2: float = 25.0) -> jax.Array:
    """Multiplicative speckle noise (bsrgan_util.py:529-544)."""
    b = x.shape[0]
    k_lvl, k_n = jax.random.split(key)
    level = jax.random.randint(k_lvl, (b, 1, 1, 1), int(noise_level1),
                               int(noise_level2) + 1).astype(jnp.float32) / 255.
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.clip(x + x * jax.random.normal(k_n, x.shape) * level, 0.0, 1.0)


def add_poisson_noise_jax(key: jax.Array, x: jax.Array) -> jax.Array:
    """Shot noise with vals in 10^[2,4] (bsrgan_util.py:547-558), Gaussian
    approximation of Poisson (exact Poisson sampling is host-bound on TPU;
    for vals >= 100 the Gaussian approximation is tight)."""
    b = x.shape[0]
    k_v, k_n = jax.random.split(key)
    vals = 10 ** (2 * jax.random.uniform(k_v, (b, 1, 1, 1)) + 2.0)
    xq = jnp.clip(jnp.round(x * 255.0), 0, 255) / 255.
    std = jnp.sqrt(jnp.maximum(xq, 1e-6) / vals)
    return jnp.clip(xq + jax.random.normal(k_n, x.shape) * std, 0.0, 1.0)


def add_jpeg_noise_jax(key: jax.Array, x: jax.Array, q_low: int = 30,
                       q_high: int = 95) -> jax.Array:
    """Per-sample random-quality JPEG (bsrgan_util.py:561-567)."""
    b = x.shape[0]
    quality = jax.random.randint(key, (b, 1, 1, 1, 1), q_low, q_high + 1
                                 ).astype(jnp.float32)
    return jpeg_compress(x, quality, differentiable=False)


# ---------------------------------------------------------------------------
# the pipeline
# ---------------------------------------------------------------------------

def _shuffled_order(key: jax.Array) -> jax.Array:
    """Random op order with idx(rescale) < idx(final-downsample)
    (bsrgan_util.py:615-618)."""
    perm = jax.random.permutation(key, 7)
    pos2 = jnp.argmax(perm == 2)
    pos3 = jnp.argmax(perm == 3)
    need_swap = pos2 > pos3
    swapped = perm.at[pos2].set(3).at[pos3].set(2)
    return jnp.where(need_swap, swapped, perm)


@functools.partial(jax.jit, static_argnames=('sf',))
def degradation_bsrgan_jax(key: jax.Array, gt: jax.Array, sf: int = 4
                           ) -> Tuple[jax.Array, jax.Array]:
    """Batched on-device BSRGAN degradation.

    Args:
        key: PRNG key.
        gt: (B, S, S, 3) HQ batch in [0, 1]; S divisible by sf*16.
        sf: scale factor (2 or 4).
    Returns:
        (lq, hq): lq (B, S/sf, S/sf, 3), hq == gt.
    """
    b, s, _, c = gt.shape
    hq = gt
    img = gt

    key = _as_fast_key(key)
    (k_order, k_pre, k_premeth, k_blur1, k_blur2, k_resz, k_reszmeth,
     k_down, k_noise, k_jpg, k_jpgp, k_final, k_fmeth) = jax.random.split(
         key, 13)

    # optional x2 pre-downsample (p=0.25 at sf=4) as canvas round-trip
    if sf == 4:
        pre = canvas_rescale(img, 0.5, jax.random.randint(k_premeth, (), 0, 3))
        img = jnp.where(jax.random.uniform(k_pre) < 0.25, pre, img)

    kernels1 = random_gaussian_kernels(k_blur1, b, sf)
    kernels2 = random_gaussian_kernels(k_blur2, b, sf)

    # random rescale parameters for op 2
    scale_idx = jax.random.randint(k_resz, (), 0, len(CANVAS_SCALES))
    resz_method = jax.random.randint(k_reszmeth, (), 0, 3)
    down_method = jax.random.randint(k_down, (), 0, 3)
    apply_jpeg_mid = jax.random.uniform(k_jpgp) < 0.9

    def op_blur1(img, k):
        return depthwise_blur(img, kernels1)

    def op_blur2(img, k):
        return depthwise_blur(img, kernels2)

    def op_rescale(img, k):
        branches = [lambda x, sc=sc: canvas_rescale(x, sc, resz_method)
                    for sc in CANVAS_SCALES]
        return jax.lax.switch(scale_idx, branches, img)

    def op_downsample(img, k):
        # the to-1/sf low-pass, kept on canvas (true decimation at the end)
        return canvas_rescale(img, 1.0 / sf, down_method)

    def op_gauss(img, k):
        return add_gaussian_noise_jax(k, img)

    def op_jpeg(img, k):
        return jnp.where(apply_jpeg_mid, add_jpeg_noise_jax(k, img), img)

    def op_isp(img, k):  # camera ISP absent (reference default isp_model=None)
        return img

    ops = [op_blur1, op_blur2, op_rescale, op_downsample, op_gauss, op_jpeg,
           op_isp]

    order = _shuffled_order(k_order)

    def body(carry, op_id):
        img, k = carry
        k, sub = jax.random.split(k)
        img = jax.lax.switch(op_id, ops, img, sub)
        return (img, k), None

    (img, _), _ = jax.lax.scan(body, (img, k_noise), order)

    # true decimation to (S/sf) + final JPEG (bsrgan_util.py:663)
    oh = s // sf
    final_method = jax.random.randint(k_fmeth, (), 0, 3)
    img = jax.lax.switch(final_method, resize_branches(s, s, oh, oh), img)
    img = jnp.clip(img, 0.0, 1.0)
    img = add_jpeg_noise_jax(k_final, img)

    return img, hq
