"""Scale-space-flow (SSF) video codec, re-derived for TPU.

The reference inherits this silently from compressai's ScaleSpaceFlow
(Agustsson et al., CVPR 2020; reference models.py:1859-1876, 2240-2254).
Pipeline per P-frame:

  y_motion = motion_encoder(cat(x_cur, x_ref))
  y_motion_hat ~ motion_hyperprior          (mean-scale, STE quantization)
  motion_info = motion_decoder(y_motion_hat)  # [flow(2), scale(1)]
  x_pred = warp_volume(gaussian_volume(x_ref), flow, scale)
  y_res = res_encoder(x_cur - x_pred)
  y_res_hat ~ res_hyperprior
  x_rec = x_pred + res_decoder(cat(y_res_hat, y_motion_hat))

Keyframes go through img_encoder/img_hyperprior/img_decoder.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from fastvideocodec_tpu.entropy.hyperprior import SSFHyperprior
from fastvideocodec_tpu.layers.transforms import SSFDecoder, SSFEncoder
from fastvideocodec_tpu.ops.warp import gaussian_volume, warp_volume


class ScaleSpaceFlow(nn.Module):
    """Base SSF codec (the reference's 'SSF-Official' capability)."""

    num_levels: int = 5
    sigma0: float = 1.5
    scale_field_shift: float = 1.0
    # transform / latent widths (compressai defaults 128/192); narrow
    # configs ("SSF-TINY") reuse the same graph for fast RD regressions
    mid_planes: int = 128
    planes: int = 192
    s2d: int = 1  # 2: TPU-native s2d transforms ('SSF-TPU'): encoders fold
    # the input into the space-to-depth domain, decoders emit full res via
    # factor-4 polyphase output convs; the scale-space volume warp (the
    # RD-critical op) stays at FULL resolution — the '-F' lesson from the
    # LSVC flagship (assets/TINY_RD.md round-4 head-to-head).
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        dt = self.dtype
        mp, pl = self.mid_planes, self.planes
        sd = self.s2d
        self.img_encoder = SSFEncoder(mp, pl, s2d=sd, dtype=dt)
        self.img_decoder = SSFDecoder(mp, out_planes=3, s2d=sd, dtype=dt)
        self.img_hyperprior = SSFHyperprior(planes=pl, mid_planes=pl, dtype=dt)
        self.motion_encoder = SSFEncoder(mp, pl, s2d=sd, dtype=dt)
        self.motion_decoder = SSFDecoder(mp, out_planes=3, s2d=sd, dtype=dt)
        self.motion_hyperprior = SSFHyperprior(planes=pl, mid_planes=pl, dtype=dt)
        self.res_encoder = SSFEncoder(mp, pl, s2d=sd, dtype=dt)
        self.res_decoder = SSFDecoder(mp, out_planes=3, s2d=sd, dtype=dt)
        self.res_hyperprior = SSFHyperprior(planes=pl, mid_planes=pl, dtype=dt)

    def __call__(self, frames, training: bool = False, rng=None):
        """Convenience/init path: keyframe + chained inter over [T, B, H, W, 3]."""
        rngs = (
            jax.random.split(rng, frames.shape[0])
            if rng is not None
            else [None] * frames.shape[0]
        )
        x_ref, lik0 = self.forward_keyframe(frames[0], training=training, rng=rngs[0])
        recons, liks = [x_ref], [lik0]
        for i in range(1, frames.shape[0]):
            x_ref, lik = self.forward_inter(
                frames[i], jax.lax.stop_gradient(x_ref), training=training, rng=rngs[i]
            )
            recons.append(x_ref)
            liks.append(lik)
        return jnp.stack(recons), liks

    def make_volume(self, x_ref):
        """Scale-space volume of the reference frame — the expensive half
        of forward_prediction (6 levels of blurs/pools/re-upsamplings at
        full resolution). Split out so call sites that warp the SAME
        reference twice (ELFVC's local-prediction + decoded-motion warps,
        models.py:2088+2097) build it once. Flat [B, H, W, D*C] layout
        (see ops.gaussian_volume)."""
        return gaussian_volume(x_ref, self.sigma0, self.num_levels)

    def warp_prediction(self, volume, motion_info):
        flow = motion_info[..., :2]
        scale_field = motion_info[..., 2:3]
        return warp_volume(volume, flow, scale_field, num_levels=self.num_levels)

    def forward_prediction(self, x_ref, motion_info):
        """motion_info: [..., 3] = (flow_x, flow_y, scale)."""
        return self.warp_prediction(self.make_volume(x_ref), motion_info)

    def forward_keyframe(self, x, training: bool, rng=None):
        y = self.img_encoder(x)
        y_hat, lik, _ = self.img_hyperprior(y, training=training, rng=rng)
        x_hat = self.img_decoder(y_hat)
        return x_hat, {"keyframe": lik}

    def forward_inter(self, x_cur, x_ref, training: bool, rng=None):
        rngs = jax.random.split(rng, 2) if rng is not None else (None, None)
        y_motion = self.motion_encoder(jnp.concatenate([x_cur, x_ref], axis=-1))
        y_motion_hat, motion_lik, _ = self.motion_hyperprior(
            y_motion, training=training, rng=rngs[0]
        )
        motion_info = self.motion_decoder(y_motion_hat)
        x_pred = self.forward_prediction(x_ref, motion_info)

        x_res = x_cur - x_pred
        y_res = self.res_encoder(x_res)
        y_res_hat, res_lik, _ = self.res_hyperprior(y_res, training=training, rng=rngs[1])

        x_res_hat = self.res_decoder(jnp.concatenate([y_res_hat, y_motion_hat], axis=-1))
        x_rec = x_pred + x_res_hat
        return x_rec, {"motion": motion_lik, "residual": res_lik}

    def aux_loss(self):
        return (
            self.img_hyperprior.aux_loss()
            + self.motion_hyperprior.aux_loss()
            + self.res_hyperprior.aux_loss()
        )
