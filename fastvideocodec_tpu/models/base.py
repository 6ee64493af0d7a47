"""Base (+'-EC', +'-ER'): the reference's experimental DVC-skeleton codec
(models.py:1550-1835).

- EC ("error concealment"): the hyper decoder emits 2x channels; the second
  half becomes sigmoid(x)-0.5 feature corrections concatenated into the
  residual decoder input (models.py:1688-1714).
- ER ("error restoration"): small conv stacks predict the quantization error
  of mv / residual-feature / z latents from their ROUNDED values; the
  corrected latents feed the decoders, with a soft2hard staged schedule
  (s2h_stage 0/1/2) and configurable detach topology (models.py:1574-1714).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from fastvideocodec_tpu.entropy.bit_estimator import BitEstimator
from fastvideocodec_tpu.layers.blocks import WarpNet
from fastvideocodec_tpu.layers.codecnet import CodecNet, er_gen_config
from fastvideocodec_tpu.layers.spynet import SpyNet
from fastvideocodec_tpu.layers.transforms import (
    OUT_CHANNEL_M,
    OUT_CHANNEL_MV,
    OUT_CHANNEL_N,
    AnalysisMVNet,
    AnalysisNet,
    AnalysisPriorNet,
    SynthesisMVNet,
    SynthesisNet,
    SynthesisPriorNet,
)
from fastvideocodec_tpu.ops import bits_estimate, flow_warp, laplace_likelihood, quantize


class Base(nn.Module):
    use_ec: bool = False
    use_er: bool = False
    s2h_stage: int = 0  # 0 soft, 1/2 staged-hard (training only)
    detach_mode: tuple = (0, 1)
    # width knobs for miniature configs (Base-TINY golden-RD assets);
    # defaults reproduce the reference geometry
    channels_n: int = OUT_CHANNEL_N
    channels_m: int = OUT_CHANNEL_M
    channels_mv: int = OUT_CHANNEL_MV
    gen_width_mv: int = 192   # ER generator widths (models.py:1587-1589)
    gen_width: int = 128
    spynet_widths: tuple = (32, 64, 32, 16)
    spynet_kernel: int = 7
    warp_width: int = 64
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        dt = self.dtype
        cn, cm, cmv = self.channels_n, self.channels_m, self.channels_mv
        self.optic_flow = SpyNet(
            widths=self.spynet_widths, kernel=self.spynet_kernel, dtype=dt
        )
        self.mv_encoder = AnalysisMVNet(conv_channels=cmv, out_channels=cmv, dtype=dt)
        self.mv_decoder = SynthesisMVNet(conv_channels=cmv, dtype=dt)
        self.warpnet = WarpNet(width=self.warp_width, dtype=dt)
        self.bit_estimator_mv = BitEstimator(cmv)
        self.res_encoder = AnalysisNet(conv_channels=cn, out_channels=cm, dtype=dt)
        self.res_decoder = SynthesisNet(conv_channels=cn, dtype=dt)
        self.prior_encoder = AnalysisPriorNet(conv_channels=cn, dtype=dt)
        self.prior_decoder = SynthesisPriorNet(
            conv_channels=cn,
            out_channels=cm * 2 if self.use_ec else cm, dtype=dt
        )
        self.bit_estimator_z = BitEstimator(cn)
        if self.use_er:
            # config-driven CodecNet stacks, exactly the reference's
            # mv/res/resprior GenNet configs (models.py:1587-1589)
            self.mv_gen = CodecNet(er_gen_config(cmv, self.gen_width_mv), dtype=dt)
            self.res_gen = CodecNet(er_gen_config(cm, self.gen_width), dtype=dt)
            self.z_gen = CodecNet(er_gen_config(cn, self.gen_width), dtype=dt)

    def _er_correct(self, gen, latent, training):
        """Residual ER prediction from the rounded latent (models.py:1623-1632)."""
        pred = jnp.round(latent)
        pred = gen(pred) + pred
        target = jax.lax.stop_gradient(latent) if 0 in self.detach_mode else latent
        pred_err = pred - target
        corr = latent + (
            jax.lax.stop_gradient(pred_err) if 1 in self.detach_mode else pred_err
        )
        return corr, pred_err

    def __call__(self, x_cur, x_ref, training: bool, rng=None):
        rngs = jax.random.split(rng, 3) if rng is not None else (None,) * 3
        B, H, W, _ = x_cur.shape
        hard = training and self.use_er and self.s2h_stage > 0
        hard2 = training and self.use_er and self.s2h_stage > 1

        mv = self.optic_flow(x_cur, x_ref)
        mv_latent = self.mv_encoder(mv)
        mv_q = quantize(mv_latent, training, rngs[0])

        if self.use_er:
            corr_mv, pred_err_mv = self._er_correct(self.mv_gen, mv_latent, training)
            mv_dec_in = jnp.round(mv_latent) if hard else corr_mv
        else:
            pred_err_mv = None
            mv_dec_in = mv_q
        mv_hat = self.mv_decoder(mv_dec_in)

        x_warp = flow_warp(x_ref, mv_hat)
        x_mc = self.warpnet(jnp.concatenate([x_warp, x_ref], axis=-1)) + x_warp
        if hard2:
            x_mc = jax.lax.stop_gradient(x_mc)

        res = x_cur - x_mc
        feature = self.res_encoder(res)
        feature_q = quantize(feature, training, rngs[1])
        z = self.prior_encoder(feature)
        z_q = quantize(z, training, rngs[2])

        if self.use_er:
            corr_z, pred_err_z = self._er_correct(self.z_gen, z, training)
            z_dec_in = jnp.round(z) if hard2 else corr_z
        else:
            pred_err_z = None
            z_dec_in = z_q
        sigma_out = self.prior_decoder(z_dec_in)

        if self.use_ec:
            sigma, correction = jnp.split(sigma_out, 2, axis=-1)
            correction = jax.nn.sigmoid(correction) - 0.5
        else:
            sigma = sigma_out
            correction = None

        if self.use_er:
            corr_feat, pred_err_feat = self._er_correct(self.res_gen, feature, training)
            res_dec_in = jnp.round(feature) if hard2 else corr_feat
        else:
            pred_err_feat = None
            res_dec_in = feature_q
        if self.use_ec:
            res_dec_in = jnp.concatenate([res_dec_in, correction], axis=-1)
        res_hat = self.res_decoder(res_dec_in)

        x_rec = x_mc + res_hat
        x_clip = jnp.clip(x_rec, 0.0, 1.0)

        bits_feature = bits_estimate(laplace_likelihood(feature_q, sigma))
        bits_z = bits_estimate(self.bit_estimator_z.likelihood(z_q))
        bits_mv = bits_estimate(self.bit_estimator_mv.likelihood(mv_q))
        denom = B * H * W

        q_err = (
            jnp.abs(mv_latent - jnp.round(mv_latent)).mean()
            + jnp.abs(feature - jnp.round(feature)).mean()
            + jnp.abs(z - jnp.round(z)).mean()
        )
        pred_err = jnp.zeros(())
        if self.use_er:
            for pe in (pred_err_mv, pred_err_feat, pred_err_z):
                pred_err = pred_err + jnp.abs(pe).mean()

        metrics = {
            "img_loss": jnp.mean((x_rec - x_cur) ** 2),
            "inter_loss": jnp.mean((x_mc - x_cur) ** 2),
            "bpp_feature": bits_feature / denom,
            "bpp_z": bits_z / denom,
            "bpp_mv": bits_mv / denom,
            "bpp_est": (bits_feature + bits_z + bits_mv) / denom,
            "Q_err": q_err,
            "pred_err": pred_err,
        }
        return x_clip, metrics

    def aux_loss(self):
        return jnp.zeros(())
