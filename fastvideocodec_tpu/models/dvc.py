"""DVC: the classic sequential P-frame codec (Lu et al., CVPR 2019).

Reference DVC/net.py:38-220 (VideoCompressor; also the 'DVC-pretrained'
capability in models.py:1432-1445):

  flow = SpyNet(x_cur, x_ref)
  mv latent   -> round/noise -> Synthesis_mv     rate: BitEstimator_mv
  x_mc        = warpnet MC refinement
  res feature -> round/noise -> Synthesis        rate: Laplace(sigma) where
  z = Analysis_prior(feature) -> round/noise -> Synthesis_prior -> sigma,
  z rate: BitEstimator_z
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from fastvideocodec_tpu.entropy.bit_estimator import BitEstimator
from fastvideocodec_tpu.layers.blocks import WarpNet
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


class DVC(nn.Module):
    """One call = one P-frame step; stateless across frames."""

    use_attn: bool = False
    # width knobs for miniature configs (DVC-TINY golden-RD assets);
    # defaults reproduce the reference geometry (DVC/subnet/basics.py)
    channels_n: int = OUT_CHANNEL_N    # conv trunk / z channels
    channels_m: int = OUT_CHANNEL_M    # residual feature channels
    channels_mv: int = OUT_CHANNEL_MV  # motion latent channels
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
        self.mv_encoder = AnalysisMVNet(
            conv_channels=cmv, out_channels=cmv, use_attn=self.use_attn, dtype=dt
        )
        self.mv_decoder = SynthesisMVNet(conv_channels=cmv, dtype=dt)
        self.warpnet = WarpNet(width=self.warp_width, dtype=dt)
        self.res_encoder = AnalysisNet(
            conv_channels=cn, out_channels=cm, use_attn=self.use_attn, dtype=dt
        )
        self.res_decoder = SynthesisNet(conv_channels=cn, dtype=dt)
        self.prior_encoder = AnalysisPriorNet(conv_channels=cn, dtype=dt)
        self.prior_decoder = SynthesisPriorNet(
            conv_channels=cn, out_channels=cm, dtype=dt
        )
        self.bit_estimator_mv = BitEstimator(cmv)
        self.bit_estimator_z = BitEstimator(cn)

    def __call__(self, x_cur, x_ref, training: bool, rng=None):
        rngs = jax.random.split(rng, 3) if rng is not None else (None,) * 3
        B, H, W, _ = x_cur.shape

        mv = self.optic_flow(x_cur, x_ref)
        mv_latent = self.mv_encoder(mv)
        mv_q = quantize(mv_latent, training, rngs[0])
        mv_hat = self.mv_decoder(mv_q)

        x_warp = flow_warp(x_ref, mv_hat)
        x_mc = self.warpnet(jnp.concatenate([x_warp, x_ref], axis=-1)) + x_warp

        res = x_cur - x_mc
        feature = self.res_encoder(res)
        z = self.prior_encoder(feature)
        z_q = quantize(z, training, rngs[1])
        sigma = self.prior_decoder(z_q)
        feature_q = quantize(feature, training, rngs[2])
        res_hat = self.res_decoder(feature_q)

        x_rec = x_mc + res_hat
        x_clip = jnp.clip(x_rec, 0.0, 1.0)

        bits_feature = bits_estimate(laplace_likelihood(feature_q, sigma))
        bits_z = bits_estimate(self.bit_estimator_z.likelihood(z_q))
        bits_mv = bits_estimate(self.bit_estimator_mv.likelihood(mv_q))
        denom = B * H * W
        metrics = {
            "img_loss": jnp.mean((x_rec - x_cur) ** 2),
            "warp_loss": jnp.mean((x_warp - x_cur) ** 2),
            "mc_loss": jnp.mean((x_mc - x_cur) ** 2),
            "bpp_feature": bits_feature / denom,
            "bpp_z": bits_z / denom,
            "bpp_mv": bits_mv / denom,
            "bpp_est": (bits_feature + bits_z + bits_mv) / denom,
        }
        return x_clip, metrics

    def aux_loss(self):
        return jnp.zeros(())
