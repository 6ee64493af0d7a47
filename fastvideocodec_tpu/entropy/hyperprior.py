"""Hyperprior entropy models.

- MeanScaleHyperPriors: stride-1 conv hyper analysis/synthesis producing
  (sigma, mu) with sigma = exp(max(raw, -7)) — reference
  entropy_models.py:150-324 (incl. the `entropy_trick` batching idea, which
  on this framework becomes a single batched host-coder call).
- SSFHyperprior: the SSF-family hyperprior with mean + QReLU-scale hyper
  decoders, STE quantization around the mean, and the optional
  super-precision SPnet y-predictor — reference models.py:1958-1999.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from fastvideocodec_tpu.entropy.factorized import EntropyBottleneck
from fastvideocodec_tpu.entropy.gaussian import GaussianConditional
from fastvideocodec_tpu.layers.blocks import SPnet
from fastvideocodec_tpu.layers.transforms import (
    SSFHyperDecoder,
    SSFHyperDecoderQReLU,
    SSFHyperEncoder,
)
from fastvideocodec_tpu.ops.math import quantize_ste


def _conv3(feats, dtype):
    return nn.Conv(feats, (3, 3), padding=1, dtype=dtype)


class MeanScaleHyperPriors(nn.Module):
    """x -> (x_hat, (x_likelihood, z_likelihood), sigma, mu).

    The RLVC-era mean-scale hyperprior (reference entropy_models.py:150-324):
    stride-1 conv hyper analysis h_a (:164-175) and synthesis h_s (:177-188)
    — z has the SAME spatial shape as x — factorized bottleneck on z,
    Gaussian conditional on x with decoded (sigma, mu). Real coding lives in
    coder/service.MeanScaleCoder, which keeps the reference's
    `entropy_trick` semantics (:278-290 — the whole batch coded in ONE
    host-coder call). Wired as Coder2D entropy_type='mshyper' (codec name
    'RLVC-HP', models/registry.py)."""

    channels: int = 128
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c, dt = self.channels, self.dtype
        self.bottleneck = EntropyBottleneck(self.channels)
        self.gaussian = GaussianConditional()
        self.h_a = [_conv3(c, dt) for _ in range(4)]
        self.h_s = [_conv3(c, dt) for _ in range(3)] + [_conv3(2 * c, dt)]

    def hyper_encode(self, x):
        lrelu = lambda v: jax.nn.leaky_relu(v, 0.01)
        z = x
        for conv in self.h_a[:-1]:
            z = lrelu(conv(z))
        return self.h_a[-1](z)

    def hyper_decode(self, z_hat):
        """z_hat -> (sigma, mu); sigma = exp(max(raw, -7))
        (entropy_models.py:205-207)."""
        lrelu = lambda v: jax.nn.leaky_relu(v, 0.01)
        g = z_hat
        for conv in self.h_s[:-1]:
            g = lrelu(conv(g))
        sigma_raw, mu = jnp.split(self.h_s[-1](g), 2, axis=-1)
        return jnp.exp(jnp.maximum(sigma_raw, -7.0)), mu

    def __call__(self, x, training: bool, rng=None):
        z = self.hyper_encode(x)
        rngs = jax.random.split(rng, 2) if rng is not None else (None, None)
        z_hat, z_lik = self.bottleneck(z, training=training, rng=rngs[0])
        sigma, mu = self.hyper_decode(z_hat)
        x_hat, x_lik = self.gaussian(x, sigma, means=mu, training=training, rng=rngs[1])
        return x_hat, (x_lik, z_lik), sigma, mu

    def aux_loss(self):
        return self.bottleneck.aux_loss()


class SSFHyperprior(nn.Module):
    """SSF-family hyperprior (reference models.py:1958-1999).

    __call__(y, training, rng, q_y_prior) ->
        (y_hat, {"y","z","pred_err_y","Q_err_y"}, new_q_y_prior)

    - y_hat = quantize_ste(y - means) + means
    - super_prec: SPnet predicts a dequantization correction from
      (round(y - means), q_y_prior); when `sp` the decoder consumes the
      (stop-gradient) predicted y instead of y_hat
    - q_y_prior carries round(y - means) to the next frame (models.py:1997).
    """

    planes: int = 192
    mid_planes: int = 192
    super_prec: bool = False
    sp: bool = False
    sp_dim: int = 64  # SPnet trunk width (reference dim=64, super_precision.py:133)
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.bottleneck = EntropyBottleneck(self.planes)
        self.hyper_encoder = SSFHyperEncoder(self.mid_planes, self.planes, dtype=self.dtype)
        self.hyper_decoder_mean = SSFHyperDecoder(self.mid_planes, self.planes, dtype=self.dtype)
        self.hyper_decoder_scale = SSFHyperDecoderQReLU(
            self.mid_planes, self.planes, dtype=self.dtype
        )
        self.gaussian = GaussianConditional()
        if self.super_prec:
            self.y_predictor = SPnet(
                output_channels=self.planes, dim=self.sp_dim, dtype=self.dtype
            )

    def __call__(self, y, training: bool, rng=None, q_y_prior=None):
        rngs = jax.random.split(rng, 2) if rng is not None else (None, None)
        z = self.hyper_encoder(y)
        z_hat, z_lik = self.bottleneck(z, training=training, rng=rngs[0])

        scales = self.hyper_decoder_scale(z_hat)
        means = self.hyper_decoder_mean(z_hat)
        # the 3x stride-2 hyper decoder emits 8*ceil(y/8) pixels; crop to y
        # (lets non-multiple-of-128 inputs work, unlike compressai)
        scales = scales[:, : y.shape[1], : y.shape[2], :]
        means = means[:, : y.shape[1], : y.shape[2], :]
        _, y_lik = self.gaussian(y, scales, means=means, training=training, rng=rngs[1])
        y_hat = quantize_ste(y - means) + means
        q_y = jnp.round(y - means) + means
        q_err_y = q_y - y

        pred_err_y = None
        new_prior = q_y_prior
        if self.super_prec:
            if q_y_prior is None:
                q_y_prior = jnp.zeros_like(y)
            round_y = jnp.round(y - means)
            all_info = jnp.concatenate([round_y, q_y_prior], axis=-1)
            pred_y = self.y_predictor(all_info) + round_y + jax.lax.stop_gradient(means)
            pred_err_y = pred_y - jax.lax.stop_gradient(y)
            if self.sp:
                y_hat = jax.lax.stop_gradient(pred_y)
            new_prior = round_y

        return (
            y_hat,
            {"y": y_lik, "z": z_lik, "pred_err_y": pred_err_y, "Q_err_y": q_err_y},
            new_prior,
        )

    def aux_loss(self):
        return self.bottleneck.aux_loss()
