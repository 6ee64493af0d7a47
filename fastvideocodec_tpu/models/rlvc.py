"""RLVC / RLVC2: sequential P-frame codecs with recurrent autoencoders and
recurrent probability models.

Reference IterPredVideoCodecs (models.py:954-1051) + Coder2D
(models.py:520-681):

  flow = SpyNet(x_cur, x_ref)
  mv_hat   = Coder2D_mv(flow)        # conv+GDN enc, ConvLSTM, entropy, dec
  x_mc     = warpnet(cat(warp(x_ref, mv_hat), x_ref)) + warp  (MC refinement)
  res_hat  = Coder2D_res(x_cur - x_mc)
  x_rec    = clip(res_hat + x_mc, 0, 1)

Entropy: 'rpm' = RecProbModel (factorized first P-frame, RPM-conditioned
Gaussian after — RLVC); 'rpm2' = BitEstimator first frame, RPM-Laplace with
mu=0 after (RLVC2, models.py:603-622). Hidden states are carried
functionally so the GOP loop is a lax.scan.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from fastvideocodec_tpu.entropy.bit_estimator import BitEstimator
from fastvideocodec_tpu.entropy.hyperprior import MeanScaleHyperPriors
from fastvideocodec_tpu.entropy.rpm import RPM, RecProbModel
from fastvideocodec_tpu.layers.blocks import ConvLSTM, WarpNet
from fastvideocodec_tpu.layers.spynet import SpyNet
from fastvideocodec_tpu.ops import bits_estimate, flow_warp, laplace_likelihood, quantize
from fastvideocodec_tpu.ops.gdn import GDN


class Coder2D(nn.Module):
    """Recurrent latent codec: 4x stride-2 conv + GDN encoder with a ConvLSTM
    after the 2nd conv; mirrored ConvTranspose + IGDN decoder; pluggable
    recurrent entropy model."""

    channels: int = 128
    kernel: int = 3
    entropy_type: str = "rpm"  # 'rpm' (RLVC) or 'rpm2' (RLVC2)
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c, k, dt = self.channels, self.kernel, self.dtype
        pad = k // 2
        conv = lambda: nn.Conv(c, (k, k), strides=(2, 2), padding=pad, dtype=dt)
        deconv = lambda feats: nn.ConvTranspose(
            feats, (k, k), strides=(2, 2), padding="SAME", dtype=dt
        )
        self.enc1, self.enc2, self.enc3 = conv(), conv(), conv()
        self.enc4 = nn.Conv(c, (k, k), strides=(2, 2), padding=pad, use_bias=False, dtype=dt)
        self.gdn1, self.gdn2, self.gdn3 = GDN(c, dtype=dt), GDN(c, dtype=dt), GDN(c, dtype=dt)
        self.dec1, self.dec2, self.dec3 = deconv(c), deconv(c), deconv(c)
        self.igdn1 = GDN(c, inverse=True, dtype=dt)
        self.igdn2 = GDN(c, inverse=True, dtype=dt)
        self.igdn3 = GDN(c, inverse=True, dtype=dt)
        self.enc_lstm = ConvLSTM(c, dtype=dt)
        self.dec_lstm = ConvLSTM(c, dtype=dt)
        if self.entropy_type == "rpm":
            self.entropy = RecProbModel(c, dtype=dt)
        elif self.entropy_type == "rpm2":
            self.rpm = RPM(c, dtype=dt)
            self.bit_estimator = BitEstimator(c)
        elif self.entropy_type == "mshyper":
            # non-recurrent mean-scale hyperprior (reference
            # entropy_models.py:150-324) — the 'RLVC-HP' variant
            self.entropy = MeanScaleHyperPriors(c, dtype=dt)
        else:
            raise ValueError(f"unknown entropy_type {self.entropy_type}")
        # final deconv channel count depends on the input; created lazily
        # via a nn.compact-free trick: store as attribute set per in_channels

    def encode(self, x, state_enc):
        x = self.gdn1(self.enc1(x))
        x = self.gdn2(self.enc2(x))
        x, state_enc = self.enc_lstm(x, state_enc)
        x = self.gdn3(self.enc3(x))
        return self.enc4(x), state_enc

    def decode(self, latent_hat, state_dec, out_channels, dec4):
        # Intentional deviation from the reference: its Coder2D decompress
        # path REUSES enc_lstm with the decoder state (models.py:655-664 —
        # the reference's dec_lstm weights are never exercised). Here the
        # decoder has its own ConvLSTM, which is the stated design; porting
        # reference checkpoints must map enc_lstm -> dec_lstm for this block.
        x = self.igdn1(self.dec1(latent_hat))
        x = self.igdn2(self.dec2(x))
        x, state_dec = self.dec_lstm(x, state_dec)
        x = self.igdn3(self.dec3(x))
        return dec4(x), state_dec

    def entropy_code(self, latent, rpm_hidden, rpm_flag, prior_latent, training, rng):
        if self.entropy_type == "mshyper":
            # hyperprior is frame-local: the recurrent hidden/prior carry
            # through untouched. x- and z-likelihoods share the latent's
            # spatial shape (stride-1 hyper convs), so they concatenate on
            # channels and the GOP engine's bits_estimate sums both rates.
            latent_hat, (x_lik, z_lik), _, _ = self.entropy(
                latent, training=training, rng=rng
            )
            likelihoods = jnp.concatenate([x_lik, z_lik], axis=-1)
            return latent_hat, likelihoods, rpm_hidden, prior_latent
        if self.entropy_type == "rpm2":
            latent_hat = quantize(latent, training, rng)
            sigma_raw, _, new_hidden = self.rpm(prior_latent, rpm_hidden)
            lik_rpm = laplace_likelihood(latent_hat, sigma_raw)
            lik_fac = self.bit_estimator.likelihood(latent_hat)
            flag = jnp.asarray(rpm_flag)
            likelihoods = jnp.where(flag, lik_rpm, lik_fac)
            rpm_hidden = jnp.where(flag, new_hidden, rpm_hidden)
            prior_latent = jax.lax.stop_gradient(jnp.round(latent))
            return latent_hat, likelihoods, rpm_hidden, prior_latent
        latent_hat, likelihoods, rpm_hidden, prior_latent, _, _ = self.entropy(
            latent, rpm_hidden, rpm_flag, prior_latent, training=training, rng=rng
        )
        return latent_hat, likelihoods, rpm_hidden, prior_latent

    def aux_loss(self):
        if self.entropy_type in ("rpm", "mshyper"):
            return self.entropy.aux_loss()
        return jnp.zeros(())


class RlvcHidden(NamedTuple):
    rae_mv: jax.Array   # [B, H/4, W/4, 4C] (enc 2C + dec 2C)
    rae_res: jax.Array
    rpm_mv: jax.Array   # [B, H/16, W/16, 2C]
    rpm_res: jax.Array
    mv_prior: jax.Array   # [B, H/16, W/16, C]
    res_prior: jax.Array


class RLVC(nn.Module):
    """IterPredVideoCodecs equivalent; one call = one P-frame step."""

    channels: int = 128
    entropy_type: str = "rpm"  # 'rpm' -> RLVC, 'rpm2' -> RLVC2
    # width knobs for miniature configs (RLVC-TINY golden-RD assets);
    # defaults reproduce the reference geometry
    spynet_widths: tuple = (32, 64, 32, 16)
    spynet_kernel: int = 7
    warp_width: int = 64
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        dt = self.dtype
        self.optic_flow = SpyNet(
            widths=self.spynet_widths, kernel=self.spynet_kernel, dtype=dt
        )
        self.warpnet = WarpNet(width=self.warp_width, dtype=dt)
        self.mv_codec = Coder2D(self.channels, kernel=3, entropy_type=self.entropy_type, dtype=dt)
        self.res_codec = Coder2D(self.channels, kernel=5, entropy_type=self.entropy_type, dtype=dt)
        self.mv_dec4 = nn.ConvTranspose(2, (3, 3), strides=(2, 2), padding="SAME", dtype=dt)
        self.res_dec4 = nn.ConvTranspose(3, (5, 5), strides=(2, 2), padding="SAME", dtype=dt)

    def init_hidden(self, batch: int, height: int, width: int) -> RlvcHidden:
        c = self.channels
        z = lambda *s: jnp.zeros(s, dtype=self.dtype)
        return RlvcHidden(
            rae_mv=z(batch, height // 4, width // 4, 4 * c),
            rae_res=z(batch, height // 4, width // 4, 4 * c),
            rpm_mv=z(batch, height // 16, width // 16, 2 * c),
            rpm_res=z(batch, height // 16, width // 16, 2 * c),
            mv_prior=z(batch, height // 16, width // 16, c),
            res_prior=z(batch, height // 16, width // 16, c),
        )

    def _run_codec(self, codec, dec4, x, rae_hidden, rpm_hidden, rpm_flag,
                   prior_latent, training, rng):
        state_enc, state_dec = jnp.split(rae_hidden, 2, axis=-1)
        latent, state_enc = codec.encode(x, state_enc)
        latent_hat, likelihoods, rpm_hidden, prior_latent = codec.entropy_code(
            latent, rpm_hidden, rpm_flag, prior_latent, training, rng
        )
        hat, state_dec = codec.decode(latent_hat, state_dec, x.shape[-1], dec4)
        rae_hidden = jax.lax.stop_gradient(
            jnp.concatenate([state_enc, state_dec], axis=-1)
        )
        bits = bits_estimate(likelihoods)
        return hat, rae_hidden, rpm_hidden, bits, prior_latent

    def __call__(self, x_ref, x_cur, hidden: RlvcHidden, rpm_flag, training: bool, rng=None):
        """One P-frame step (reference forward, models.py:982-1040).

        Returns (x_rec, new_hidden, metrics dict).
        """
        rngs = jax.random.split(rng, 2) if rng is not None else (None, None)
        B, H, W, _ = x_cur.shape

        mv = self.optic_flow(x_cur, x_ref)
        mv_hat, rae_mv, rpm_mv, mv_bits, mv_prior = self._run_codec(
            self.mv_codec, self.mv_dec4, mv, hidden.rae_mv, hidden.rpm_mv,
            rpm_flag, hidden.mv_prior, training, rngs[0],
        )
        x_warp = flow_warp(x_ref, mv_hat)
        x_mc = self.warpnet(jnp.concatenate([x_warp, x_ref], axis=-1)) + x_warp
        res = x_cur - x_mc
        res_hat, rae_res, rpm_res, res_bits, res_prior = self._run_codec(
            self.res_codec, self.res_dec4, res, hidden.rae_res, hidden.rpm_res,
            rpm_flag, hidden.res_prior, training, rngs[1],
        )
        x_rec = jnp.clip(res_hat + x_mc, 0.0, 1.0)

        denom = H * W * B
        new_hidden = RlvcHidden(rae_mv, rae_res, rpm_mv, rpm_res, mv_prior, res_prior)
        metrics = {
            "bpp_est": (mv_bits + res_bits) / denom,
            "bpp_res_est": res_bits / denom,
            "img_loss": jnp.mean((x_cur - x_rec) ** 2),
            "warp_loss": jnp.mean((x_cur - x_warp) ** 2),
            "mc_loss": jnp.mean((x_cur - x_mc) ** 2),
        }
        return x_rec, new_hidden, metrics

    def aux_loss(self):
        return self.mv_codec.aux_loss() + self.res_codec.aux_loss()
