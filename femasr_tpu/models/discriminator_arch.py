"""U-Net discriminator with spectral normalization.

Capability parity with /root/reference/basicsr/archs/discriminator_arch.py
(UNetDiscriminatorSN:7-67, the Real-ESRGAN design). Spectral norm is
implemented natively for JAX: the power-iteration vector `u` lives in a
mutable 'spectral' variable collection updated once per training forward
(the TPU analogue of torch.nn.utils.spectral_norm's in-place update).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.layers import resize_bilinear
from ..utils.registry import ARCH_REGISTRY

Dtype = Any


class SpectralConv(nn.Module):
    """Conv2d whose kernel is divided by its largest singular value.

    Matches torch.nn.utils.spectral_norm semantics: the kernel is viewed as a
    (out, in*kh*kw) matrix (torch layout), one power iteration per training
    step updates `u`, and sigma = u^T W v. eps = 1e-12.
    """
    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 1
    use_bias: bool = False
    eps: float = 1e-12
    # power iterations run at variable-init time so sigma starts converged.
    # torch inits u random (one iteration per forward, converging over the
    # first steps); with 9 stacked SN convs a random-u sigma underestimate
    # compounds to ~1e13 D outputs at init, so we warm-start instead.
    init_power_iters: int = 15
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, update_stats: bool = False) -> jax.Array:
        in_ch = x.shape[-1]
        k = self.kernel_size
        kernel = self.param(
            'kernel',
            nn.initializers.variance_scaling(1 / 3, 'fan_in', 'uniform'),
            (k, k, in_ch, self.features), jnp.float32)
        if self.use_bias:
            bias = self.param('bias', nn.initializers.zeros,
                              (self.features,), jnp.float32)

        # torch reshape order: (O, I, kh, kw) -> (O, I*kh*kw)
        w_mat = kernel.transpose(3, 2, 0, 1).reshape(self.features, -1)

        # torch.nn.utils.spectral_norm parity: u/v are persistent buffers;
        # training forwards run one power iteration and store u/v, eval
        # forwards reuse the stored vectors as-is.
        def warm_uv():
            w_sg = jax.lax.stop_gradient(w_mat)
            u0 = _l2_normalize(
                jax.random.normal(jax.random.PRNGKey(0), (self.features,)),
                self.eps)
            v0 = _l2_normalize(w_sg.T @ u0, self.eps)
            for _ in range(max(self.init_power_iters - 1, 0)):
                u0 = _l2_normalize(w_sg @ v0, self.eps)
                v0 = _l2_normalize(w_sg.T @ u0, self.eps)
            return _l2_normalize(w_sg @ v0, self.eps), v0

        u_var = self.variable('spectral', 'u', lambda: warm_uv()[0])
        # derive v from the already-warm u with one matvec instead of
        # re-running the full warm-up a second time
        v_var = self.variable(
            'spectral', 'v',
            lambda: _l2_normalize(
                jax.lax.stop_gradient(w_mat).T @ u_var.value, self.eps))
        u, v = u_var.value, v_var.value

        if update_stats:
            w_sg = jax.lax.stop_gradient(w_mat)
            v = _l2_normalize(w_sg.T @ u, self.eps)
            u = _l2_normalize(w_sg @ v, self.eps)
            if not self.is_initializing():
                u_var.value = u
                v_var.value = v

        u = jax.lax.stop_gradient(u)
        v = jax.lax.stop_gradient(v)
        sigma = jnp.dot(u, w_mat @ v)
        kernel_sn = (kernel / sigma).astype(self.dtype)

        out = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel_sn,
            window_strides=(self.stride, self.stride),
            padding=((self.padding, self.padding),
                     (self.padding, self.padding)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        if self.use_bias:
            out = out + bias.astype(self.dtype)
        return out


def _l2_normalize(x: jax.Array, eps: float) -> jax.Array:
    return x / (jnp.linalg.norm(x) + eps)


@ARCH_REGISTRY.register()
class UNetDiscriminatorSN(nn.Module):
    """U-Net discriminator: 3 SN-conv downs, 3 bilinear-up SN-convs with
    skips, 2 extra SN-convs, 1-channel output map."""
    num_in_ch: int = 3
    num_feat: int = 64
    skip_connection: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, update_stats: bool = False) -> jax.Array:
        nf = self.num_feat
        lrelu = lambda y: nn.leaky_relu(y, negative_slope=0.2)  # noqa: E731

        x0 = lrelu(nn.Conv(nf, (3, 3), padding=((1, 1), (1, 1)),
                           dtype=self.dtype, param_dtype=jnp.float32,
                           name='conv0')(x))
        x1 = lrelu(SpectralConv(nf * 2, 4, 2, 1, dtype=self.dtype,
                                name='conv1')(x0, update_stats))
        x2 = lrelu(SpectralConv(nf * 4, 4, 2, 1, dtype=self.dtype,
                                name='conv2')(x1, update_stats))
        x3 = lrelu(SpectralConv(nf * 8, 4, 2, 1, dtype=self.dtype,
                                name='conv3')(x2, update_stats))

        x3 = resize_bilinear(x3, (x3.shape[1] * 2, x3.shape[2] * 2))
        x4 = lrelu(SpectralConv(nf * 4, 3, 1, 1, dtype=self.dtype,
                                name='conv4')(x3, update_stats))
        if self.skip_connection:
            x4 = x4 + x2
        x4 = resize_bilinear(x4, (x4.shape[1] * 2, x4.shape[2] * 2))
        x5 = lrelu(SpectralConv(nf * 2, 3, 1, 1, dtype=self.dtype,
                                name='conv5')(x4, update_stats))
        if self.skip_connection:
            x5 = x5 + x1
        x5 = resize_bilinear(x5, (x5.shape[1] * 2, x5.shape[2] * 2))
        x6 = lrelu(SpectralConv(nf, 3, 1, 1, dtype=self.dtype,
                                name='conv6')(x5, update_stats))
        if self.skip_connection:
            x6 = x6 + x0

        out = lrelu(SpectralConv(nf, 3, 1, 1, dtype=self.dtype,
                                 name='conv7')(x6, update_stats))
        out = lrelu(SpectralConv(nf, 3, 1, 1, dtype=self.dtype,
                                 name='conv8')(out, update_stats))
        out = nn.Conv(1, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                      param_dtype=jnp.float32, name='conv9')(out)
        return out
