"""Recurrent probability model (RPM) + RecProbModel.

Reference entropy_models.py:328-357 (RPM: 8 convs around a ConvLSTM
producing (sigma_raw, mu) from the previous quantized latent) and
entropy_models.py:26-148 (RecProbModel: factorized bottleneck for the first
P-frame, RPM-conditioned Gaussian for the rest; sigma post-processed as
exp(max(raw, -7)) / 10).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from fastvideocodec_tpu.entropy.factorized import EntropyBottleneck
from fastvideocodec_tpu.entropy.gaussian import GaussianConditional
from fastvideocodec_tpu.layers.blocks import ConvLSTM


class RPM(nn.Module):
    """sigma_raw, mu, new_hidden = RPM(prior_latent, hidden).

    hidden: [B, H, W, 2C] (c, h concat); prior_latent: [B, H, W, C].
    The final conv output passes through ReLU before the (sigma, mu) split,
    exactly as the reference does (entropy_models.py:355-356).
    """

    channels: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, hidden):
        c = self.channels
        for _ in range(4):
            x = jax.nn.relu(nn.Conv(c, (3, 3), padding=1, dtype=self.dtype)(x))
        x, hidden = ConvLSTM(c, dtype=self.dtype)(x, hidden)
        for _ in range(3):
            x = jax.nn.relu(nn.Conv(c, (3, 3), padding=1, dtype=self.dtype)(x))
        sigma_mu = jax.nn.relu(nn.Conv(2 * c, (3, 3), padding=1, dtype=self.dtype)(x))
        sigma, mu = jnp.split(sigma_mu, 2, axis=-1)
        return sigma, mu, hidden


class RecProbModel(nn.Module):
    """Recurrent conditional entropy model for RLVC latents.

    __call__(x, rpm_hidden, rpm_flag, prior_latent, training, rng) returns
    (x_hat, likelihoods, new_hidden, new_prior_latent, sigma, mu).

    rpm_flag selects factorized (first P-frame) vs RPM-conditioned Gaussian
    (later frames) — reference entropy_models.py:55-68. Both branches run
    under lax.cond-compatible shapes; sigma/mu are also returned so the real
    coding path can build indexes without re-running the net.
    """

    channels: int = 128
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.rpm = RPM(self.channels, dtype=self.dtype)
        self.bottleneck = EntropyBottleneck(self.channels)
        self.gaussian = GaussianConditional()

    def __call__(self, x, rpm_hidden, rpm_flag, prior_latent, training: bool, rng=None):
        # Run both branches (cheap relative to transforms) and select — keeps
        # the module jit/scan friendly with a traced rpm_flag.
        sigma_raw, mu, new_hidden = self.rpm(prior_latent, rpm_hidden)
        sigma = jnp.exp(jnp.maximum(sigma_raw, -7.0)) / 10.0
        x_hat_g, lik_g = self.gaussian(x, sigma, means=mu, training=training, rng=rng)
        x_hat_f, lik_f = self.bottleneck(x, training=training, rng=rng)

        flag = jnp.asarray(rpm_flag)
        x_hat = jnp.where(flag, x_hat_g, x_hat_f)
        likelihoods = jnp.where(flag, lik_g, lik_f)
        new_hidden = jnp.where(flag, new_hidden, rpm_hidden)
        new_prior = jax.lax.stop_gradient(jnp.round(x))
        return x_hat, likelihoods, new_hidden, new_prior, sigma, mu

    def aux_loss(self):
        return self.bottleneck.aux_loss()
