"""FID (Frechet Inception Distance) computation.

Parity target: /root/reference/scripts/metrics/calculate_fid.py (vestigial in
the reference — it imports a missing `basicsr.archs.inception`). The Frechet
distance and feature-statistics machinery here are complete; the feature
extractor is pluggable (`feature_fn(batch_nhwc) -> (B, D)`): InceptionV3
weights are not redistributable offline, so a converted-VGG16 extractor
(models/vgg_arch.py) or any user-provided backbone slots in.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np
from scipy import linalg


def frechet_distance(mu1: np.ndarray, sigma1: np.ndarray, mu2: np.ndarray,
                     sigma2: np.ndarray, eps: float = 1e-6) -> float:
    """||mu1 - mu2||^2 + Tr(S1 + S2 - 2 sqrt(S1 S2))."""
    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1 @ sigma2, disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset) @ (sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


def feature_statistics(features: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    mu = np.mean(features, axis=0)
    sigma = np.cov(features, rowvar=False)
    return mu, sigma


def extract_features(folder: str, feature_fn: Callable, batch_size: int = 8,
                     size: Optional[int] = None) -> np.ndarray:
    """Run `feature_fn` over all images in a folder.

    size=None (default): images are fed at native resolution, batched per
    distinct (H, W) so the backbone's own input resize defines the kernel —
    matching pytorch-fid, which never host-resizes (one XLA program per
    distinct size in the folder). Pass an int to force a host-side
    cv2.INTER_AREA pre-resize instead (single program, non-canonical).
    """
    import cv2

    from ..data.data_util import make_dataset
    groups: dict = {}
    for p in make_dataset(folder):
        img = cv2.imread(p, cv2.IMREAD_COLOR)
        if img is None:
            continue
        rgb = cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.
        if size is not None:
            rgb = cv2.resize(rgb, (size, size),
                             interpolation=cv2.INTER_AREA)
        groups.setdefault(rgb.shape[:2], []).append(rgb)

    feats = []
    for imgs in groups.values():
        for i in range(0, len(imgs), batch_size):
            feats.append(np.asarray(feature_fn(
                np.stack(imgs[i:i + batch_size]))))
    return np.concatenate(feats, axis=0)


def vgg_feature_fn(vgg_params, layer: str = 'relu5_3',
                   vgg_type: str = 'vgg16') -> Callable:
    """Spatially-pooled VGG features as an FID backbone."""
    import jax
    import jax.numpy as jnp

    from ..models.vgg_arch import VGGFeatureExtractor
    extractor = VGGFeatureExtractor(layer_name_list=[layer],
                                    vgg_type=vgg_type)

    @jax.jit
    def fn(batch):
        feats = extractor.apply({'params': vgg_params},
                                jnp.asarray(batch))[layer]
        return jnp.mean(feats, axis=(1, 2))

    return fn


def _folder_or_stats(path: str, feature_fn: Callable, batch_size: int
                     ) -> Tuple[np.ndarray, np.ndarray, Optional[str]]:
    """(mu, sigma, backbone_label) from an image folder, or a precomputed
    stats .npz (scripts/metrics/calculate_fid_stats.py)."""
    if path.endswith('.npz'):
        with np.load(path) as z:
            backbone = str(z['backbone']) if 'backbone' in z else None
            return z['mu'], z['sigma'], backbone
    mu, sigma = feature_statistics(
        extract_features(path, feature_fn, batch_size))
    return mu, sigma, None


def calculate_fid(folder1: str, folder2: str, feature_fn: Callable,
                  batch_size: int = 8) -> float:
    """FID between two image folders (either may be a stats .npz)."""
    mu1, s1, b1 = _folder_or_stats(folder1, feature_fn, batch_size)
    mu2, s2, b2 = _folder_or_stats(folder2, feature_fn, batch_size)
    if b1 and b2 and b1 != b2:
        raise ValueError(f'stats backbones differ: {b1} vs {b2}')
    if mu1.shape != mu2.shape:
        raise ValueError(
            f'feature dims differ ({mu1.shape} vs {mu2.shape}) — the stats '
            '.npz was computed with a different backbone than this run')
    return frechet_distance(mu1, s1, mu2, s2)
