"""Generalized Divisive Normalization (flax.linen, NHWC).

y[i] = x[i] / sqrt(beta[i] + sum_j gamma[j,i] * x[j]^2)   (forward)
y[i] = x[i] * sqrt(...)                                   (inverse)

Parameterisation mirrors the reference (DVC/subnet/GDN.py:26-93): beta and
gamma are stored as sqrt(value + pedestal) and lower-bounded with the
pass-through-gradient LowerBound before squaring. The 1x1 "conv" over
channels is expressed as a matmul so it lands on the MXU.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from fastvideocodec_tpu.ops.math import lower_bound


class GDN(nn.Module):
    channels: int
    inverse: bool = False
    beta_min: float = 1e-6
    gamma_init: float = 0.1
    reparam_offset: float = 2 ** -18
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ch = self.channels
        pedestal = self.reparam_offset ** 2
        beta_bound = (self.beta_min + pedestal) ** 0.5
        gamma_bound = self.reparam_offset

        beta = self.param(
            "beta", lambda _: jnp.sqrt(jnp.ones((ch,)) + pedestal)
        )
        gamma = self.param(
            "gamma",
            lambda _: jnp.sqrt(self.gamma_init * jnp.eye(ch) + pedestal),
        )

        beta = lower_bound(beta, beta_bound) ** 2 - pedestal
        gamma = lower_bound(gamma, gamma_bound) ** 2 - pedestal

        # norm[o] = sum_i gamma[o, i] * x[i]^2 + beta[o]
        # (torch conv2d weight layout [out, in, 1, 1], GDN.py:81-84)
        # perf mode (bf16 activations): single-pass MXU; f32: exact
        if self.dtype == jnp.bfloat16:
            x2 = x * x
            norm = jnp.einsum(
                "bhwi,oi->bhwo", x2, gamma.astype(x.dtype),
                preferred_element_type=jnp.float32,
            )
            return (
                x * jnp.sqrt(norm + beta).astype(x.dtype)
                if self.inverse
                else x / jnp.sqrt(norm + beta).astype(x.dtype)
            )
        x2 = (x * x).astype(jnp.float32)
        norm = jnp.einsum(
            "bhwi,oi->bhwo", x2, gamma.astype(jnp.float32), precision="highest"
        )
        norm = jnp.sqrt(norm + beta.astype(jnp.float32)).astype(x.dtype)

        if self.inverse:
            return x * norm
        return x / norm
