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
from fastvideocodec_tpu.ops.warp import (
    depth_to_space,
    gaussian_volume,
    s2d_phase_mean,
    space_to_depth,
    warp_volume,
    warp_volume_pyramid_s2d,
)


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
    # pipeline_s2d (requires s2d==2): the WHOLE inter-frame pipeline runs
    # in the s2d domain — forward_keyframe/forward_inter take and return
    # [B, H/2, W/2, 12] tensors, component boundaries never materialize a
    # full-resolution 3-channel tensor (each one costs a multi-ms
    # lane-padded HBM pass at 1080p, round-5 xprof), and the scale-space
    # prediction becomes the pyramid op: full-res level-0 sample via the
    # kernel's fused s2d relayouts + half-res blurred stack
    # (ops.warp_volume_pyramid_s2d). Weight shapes match non-pipeline
    # s2d=2 exactly (only input channel order permutes).
    pipeline_s2d: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        dt = self.dtype
        mp, pl = self.mid_planes, self.planes
        sd = self.s2d
        pipe = self.pipeline_s2d
        self.img_encoder = SSFEncoder(mp, pl, s2d=sd, input_s2d=pipe, dtype=dt)
        self.img_decoder = SSFDecoder(mp, out_planes=3, s2d=sd,
                                      output_s2d=pipe, dtype=dt)
        self.img_hyperprior = SSFHyperprior(planes=pl, mid_planes=pl, dtype=dt)
        self.motion_encoder = SSFEncoder(mp, pl, s2d=sd, input_s2d=pipe, dtype=dt)
        self.motion_decoder = SSFDecoder(mp, out_planes=3, s2d=sd,
                                         output_s2d=pipe, dtype=dt)
        self.motion_hyperprior = SSFHyperprior(planes=pl, mid_planes=pl, dtype=dt)
        self.res_encoder = SSFEncoder(mp, pl, s2d=sd, input_s2d=pipe, dtype=dt)
        self.res_decoder = SSFDecoder(mp, out_planes=3, s2d=sd,
                                      output_s2d=pipe, dtype=dt)
        self.res_hyperprior = SSFHyperprior(planes=pl, mid_planes=pl, dtype=dt)

    def __call__(self, frames, training: bool = False, rng=None):
        """Convenience/init path: keyframe + chained inter over [T, B, H, W, 3].

        In pipeline_s2d mode the frames fold into the s2d domain once at
        entry and the recon stack unfolds once at exit — the per-frame
        calls never touch a full-resolution tensor."""
        rngs = (
            jax.random.split(rng, frames.shape[0])
            if rng is not None
            else [None] * frames.shape[0]
        )
        if self.pipeline_s2d:
            frames = jax.vmap(lambda f: space_to_depth(f, self.s2d))(frames)
        x_ref, lik0 = self.forward_keyframe(frames[0], training=training, rng=rngs[0])
        recons, liks = [x_ref], [lik0]
        for i in range(1, frames.shape[0]):
            x_ref, lik = self.forward_inter(
                frames[i], jax.lax.stop_gradient(x_ref), training=training, rng=rngs[i]
            )
            recons.append(x_ref)
            liks.append(lik)
        out = jnp.stack(recons)
        if self.pipeline_s2d:
            out = jax.vmap(lambda f: depth_to_space(f, self.s2d))(out)
        return out, liks

    def make_volume(self, x_ref):
        """Scale-space volume of the reference frame — the expensive half
        of forward_prediction. Split out so call sites that warp the SAME
        reference twice (ELFVC's local-prediction + decoded-motion warps,
        models.py:2088+2097) build it once.

        Plain mode: flat [B, H, W, D*C] stack (ops.gaussian_volume).
        pipeline_s2d: (x_ref_s2d, vol_half) pyramid — level 0 stays the
        s2d reference itself, blurred levels live at /2."""
        # getattr: MCVC borrows these methods without defining the field
        if getattr(self, "pipeline_s2d", False):
            h = s2d_phase_mean(x_ref, 3)  # == avg_pool2 of the full frame
            return x_ref, gaussian_volume(h, self.sigma0, self.num_levels - 1)
        return gaussian_volume(x_ref, self.sigma0, self.num_levels)

    def warp_prediction(self, volume, motion_info):
        if getattr(self, "pipeline_s2d", False):
            level0_s2d, vol_half = volume
            return warp_volume_pyramid_s2d(
                level0_s2d, vol_half, motion_info, self.num_levels
            )
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
