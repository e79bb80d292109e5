"""Codebook vector quantization (the HRP bottleneck) — TPU-first.

Capability parity with the reference VectorQuantizer
(/root/reference/basicsr/archs/femasr_arch.py:14-112): L2 nearest-neighbor
codebook lookup with a straight-through estimator, the HQ-stage commitment
loss `q_latent + beta * e_latent`, and the LQ-stage supervised loss
`beta * MSE(z, sg(z_q_gt)) + gram(z, sg(z_q_gt))`.

TPU-first design notes:
- NHWC features; no permutes. The distance argmin runs as a single fused
  matmul (tokens x codebook on the MXU) + row reduction; there is no one-hot
  scatter/matmul round-trip (the reference materializes a (N, n_e) one-hot and
  multiplies it back — on TPU `jnp.take` lowers to a dynamic-gather which XLA
  fuses).
- All loss algebra in float32 regardless of the activation dtype.
- An optional fused Pallas kernel (ops/pallas/vq.py) computes the argmin
  without materializing the (N, n_e) distance matrix in HBM.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def nearest_code_indices(z_flat: jax.Array, codebook: jax.Array,
                         backend: str = 'xla',
                         index_f32: bool = False) -> jax.Array:
    """argmin_j ||z_i - c_j||^2 for flattened tokens.

    Args:
        z_flat: (N, C) float tokens.
        codebook: (n_e, C) float codebook.
        backend: 'xla' | 'pallas'.
        index_f32: force the token x codebook cross term to f32 even when
            tokens are bf16. In bf16 models the default path casts the
            codebook to the token dtype for MXU rate, so nearest-code
            indices can flip on near-ties vs the f32/reference path; set
            this for gt-index generation or eval-parity checks where index
            agreement matters more than throughput (see PARITY.md).
    Returns:
        (N,) int32 indices.
    """
    if index_f32:
        z_flat = z_flat.astype(jnp.float32)
    if backend == 'pallas':
        from .pallas.vq import vq_argmin
        return vq_argmin(z_flat, codebook)
    # ||z||^2 is constant across codes -> drop it from the argmin.
    # The token x codebook matmul runs on the MXU in the caller's compute
    # dtype (f32 tokens -> exact f32 path; bf16 tokens -> 8x MXU rate) with
    # a float32 accumulator/output so the argmin compares f32 distances.
    cb32 = codebook.astype(jnp.float32)
    zc = jnp.einsum('nc,ec->ne', z_flat, codebook.astype(z_flat.dtype),
                    preferred_element_type=jnp.float32)
    d = jnp.sum(cb32 * cb32, axis=1)[None, :] - 2.0 * zc
    return jnp.argmin(d, axis=1).astype(jnp.int32)


def gram_loss(x: jax.Array, y: jax.Array) -> jax.Array:
    """Gram-matrix texture loss between (B, H, W, C) feature maps.

    Parity: femasr_arch.py:40-48.
    """
    b, h, w, c = x.shape
    xf = x.reshape(b, h * w, c).astype(jnp.float32)
    yf = y.reshape(b, h * w, c).astype(jnp.float32)
    gmx = jnp.einsum('bnc,bnd->bcd', xf, xf) / (h * w)
    gmy = jnp.einsum('bnc,bnd->bcd', yf, yf) / (h * w)
    return jnp.mean(jnp.square(gmx - gmy))


def vector_quantize(z: jax.Array,
                    codebook: jax.Array,
                    gt_indices: Optional[jax.Array] = None,
                    beta: float = 0.25,
                    lq_stage: bool = False,
                    backend: str = 'xla',
                    index_f32: bool = False
                    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Quantize z -> nearest codebook entries with straight-through gradients.

    Args:
        z: (B, H, W, C) continuous features.
        codebook: (n_e, C) embedding table.
        gt_indices: optional (B, H, W) or (B, 1, H, W) int ground-truth code
            indices (LQ stage supervision from the frozen HQ model).
        beta: commitment cost.
        lq_stage: enables the supervised LQ-stage loss when gt_indices given.
        backend: index search backend ('xla' | 'pallas').

    Returns:
        (z_q, codebook_loss, indices): z_q has z's shape & dtype (straight-
        through); codebook_loss is a float32 scalar; indices is (B, H, W) int32.

    Gradient semantics (parity with femasr_arch.py:84-95):
        - e_latent_loss = mean((sg(z_q) - z)^2)   -> trains the encoder
        - q_latent_loss = mean((z_q - sg(z))^2)   -> trains the codebook
        - straight-through: z_q_ste = z + sg(z_q - z)
    """
    b, h, w, c = z.shape
    zf32 = z.astype(jnp.float32)
    cb32 = codebook.astype(jnp.float32)

    indices = nearest_code_indices(
        jax.lax.stop_gradient(z.reshape(-1, c)), codebook, backend=backend,
        index_f32=index_f32)
    z_q = jnp.take(cb32, indices, axis=0).reshape(b, h, w, c)

    if gt_indices is not None:
        gt_idx = gt_indices.reshape(b, h, w).astype(jnp.int32)
        z_q_gt = jnp.take(cb32, gt_idx.reshape(-1), axis=0).reshape(b, h, w, c)

    e_latent_loss = jnp.mean(jnp.square(jax.lax.stop_gradient(z_q) - zf32))
    q_latent_loss = jnp.mean(jnp.square(z_q - jax.lax.stop_gradient(zf32)))

    if lq_stage and gt_indices is not None:
        z_q_gt_sg = jax.lax.stop_gradient(z_q_gt)
        codebook_loss = beta * jnp.mean(jnp.square(z_q_gt_sg - zf32))
        codebook_loss = codebook_loss + gram_loss(zf32, z_q_gt_sg)
    else:
        codebook_loss = q_latent_loss + beta * e_latent_loss

    # straight-through estimator, in the caller's compute dtype
    z_q_ste = z + jax.lax.stop_gradient(z_q.astype(z.dtype) - z)

    return z_q_ste, codebook_loss, indices.reshape(b, h, w)


def codebook_perplexity(indices: jax.Array, n_e: int) -> jax.Array:
    """exp(entropy) of the code-usage distribution — codebook-utilization
    telemetry (the collapse diagnostic from the VQGAN-scaling literature;
    not in the reference, which never monitors codebook health)."""
    counts = jnp.zeros((n_e,), jnp.float32).at[indices.reshape(-1)].add(1.0)
    probs = counts / jnp.maximum(counts.sum(), 1.0)
    entropy = -jnp.sum(jnp.where(probs > 0, probs * jnp.log(probs), 0.0))
    return jnp.exp(entropy)


class VectorQuantizer(nn.Module):
    """Codebook module owning the (n_e, e_dim) embedding table.

    Init parity: reference initializes embeddings U(-1/n_e, 1/n_e)
    (femasr_arch.py:33).
    """
    n_e: int
    e_dim: int
    beta: float = 0.25
    lq_stage: bool = False
    backend: str = 'xla'
    # force f32 index search in bf16 models (reference-exact indices for
    # gt-index generation / eval parity; see nearest_code_indices)
    index_f32: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        bound = 1.0 / self.n_e
        self.embedding = self.param(
            'embedding',
            lambda key, shape: jax.random.uniform(key, shape, jnp.float32,
                                                  -bound, bound),
            (self.n_e, self.e_dim))

    def __call__(self, z: jax.Array,
                 gt_indices: Optional[jax.Array] = None
                 ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        return vector_quantize(z, self.embedding, gt_indices=gt_indices,
                               beta=self.beta, lq_stage=self.lq_stage,
                               backend=self.backend,
                               index_f32=self.index_f32)

    def get_codebook_entry(self, indices: jax.Array) -> jax.Array:
        """Decode an int index map (B, H, W) or (B, 1, H, W) to embeddings (B, H, W, C).

        Parity: femasr_arch.py:102-112 (one-hot matmul -> gather).
        """
        if indices.ndim == 4:
            indices = indices.reshape(indices.shape[0], *indices.shape[2:])
        b, h, w = indices.shape
        flat = indices.reshape(-1).astype(jnp.int32)
        z_q = jnp.take(self.embedding, flat, axis=0)
        return z_q.reshape(b, h, w, self.e_dim).astype(self.dtype)
