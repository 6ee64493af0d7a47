"""ELFVC / ELFVC-SP ("Vesper"): low-latency SSF with flow prediction and
super-precision quantization-error recovery.

Reference models.py:1866-2124. On top of the SSF skeleton:

- a FlowPredictor produces a local motion estimate from
  (x_ref, x_ref_ref, motion_info_prior); the codec transmits only the
  *delta* between the true motion and the prior (models.py:2087-2097),
- SP: each hyperprior carries an SPnet that predicts the dequantization
  error of y from (round(y - mu), Q_y_prior); its pred_err feeds an aux
  loss (models.py:1988-1998, 292-308),
- temporal state (x_ref_ref, motion prior, Q_y priors) is carried
  functionally through `ElfvcState` so the GOP loop is a lax.scan.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from fastvideocodec_tpu.entropy.hyperprior import SSFHyperprior
from fastvideocodec_tpu.layers.transforms import FlowPredictor, SSFDecoder, SSFEncoder
from fastvideocodec_tpu.models.ssf import ScaleSpaceFlow


class ElfvcState(NamedTuple):
    """Temporal carry for the GOP scan (reference reset(), models.py:2020-2024)."""

    x_ref_ref: jax.Array          # [B, H, W, 3]
    motion_info_prior: jax.Array  # [B, H, W, 3]
    q_y_prior_motion: jax.Array   # [B, H/16, W/16, planes]
    q_y_prior_res: jax.Array


class ELFVC(nn.Module):
    super_prec: bool = False  # '-SP' in the reference codec name
    sp_stage: int = 1         # >=1: motion SP active; >=2: residual SP active
    num_levels: int = 5
    sigma0: float = 1.5
    scale_field_shift: float = 1.0
    planes: int = 192
    mid_planes: int = 128
    sp_dim: int = 64
    s2d: int = 1  # 2: TPU-native s2d transforms + s2d FlowPredictor
    # ('ELFVC-TPU'/'ELFVC-SP-TPU'); scale-space warp stays full-res
    # pipeline_s2d: whole-pipeline s2d domain + pyramid scale-space warp
    # (see ScaleSpaceFlow.pipeline_s2d); the temporal state carries s2d
    # tensors
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
        self.flow_predictor = FlowPredictor(mid_planes=mp, s2d=sd,
                                            input_s2d=pipe, output_s2d=pipe,
                                            quarter_trunk=pipe, dtype=dt)
        self.motion_encoder = SSFEncoder(mp, pl, s2d=sd, input_s2d=pipe, dtype=dt)
        self.motion_decoder = SSFDecoder(mp, out_planes=3, s2d=sd,
                                         output_s2d=pipe, dtype=dt)
        self.res_encoder = SSFEncoder(mp, pl, s2d=sd, input_s2d=pipe, dtype=dt)
        self.res_decoder = SSFDecoder(mp, out_planes=3, s2d=sd,
                                      output_s2d=pipe, dtype=dt)
        self.motion_hyperprior = SSFHyperprior(
            planes=pl, mid_planes=pl, super_prec=self.super_prec,
            sp=self.sp_stage >= 1, sp_dim=self.sp_dim, dtype=dt,
        )
        self.res_hyperprior = SSFHyperprior(
            planes=pl, mid_planes=pl, super_prec=self.super_prec,
            sp=self.sp_stage >= 2, sp_dim=self.sp_dim, dtype=dt,
        )

    forward_prediction = ScaleSpaceFlow.forward_prediction
    make_volume = ScaleSpaceFlow.make_volume
    warp_prediction = ScaleSpaceFlow.warp_prediction
    forward_keyframe = ScaleSpaceFlow.forward_keyframe

    def __call__(self, frames, training: bool = False, rng=None):
        """Convenience/init path over [T, B, H, W, 3] (creates all params).

        pipeline_s2d folds/unfolds once at the GOP boundary (see
        ScaleSpaceFlow.__call__)."""
        from fastvideocodec_tpu.ops.warp import depth_to_space, space_to_depth

        T = frames.shape[0]
        rngs = jax.random.split(rng, T) if rng is not None else [None] * T
        if self.pipeline_s2d:
            frames = jax.vmap(lambda f: space_to_depth(f, self.s2d))(frames)
        _, B, H, W, _ = frames.shape
        x_ref, lik0 = self.forward_keyframe(frames[0], training=training, rng=rngs[0])
        state = self.init_state(B, H, W)
        recons, liks = [x_ref], [lik0]
        for i in range(1, T):
            x_ref, lik, state = self.forward_inter(
                frames[i], jax.lax.stop_gradient(x_ref), state,
                training=training, rng=rngs[i],
            )
            recons.append(x_ref)
            liks.append(lik)
        out = jnp.stack(recons)
        if self.pipeline_s2d:
            out = jax.vmap(lambda f: depth_to_space(f, self.s2d))(out)
        return out, liks

    def init_state(self, batch: int, height: int, width: int) -> ElfvcState:
        """(height, width) are the spatial dims of the tensors AS CARRIED:
        full-res in plain mode, the s2d dims (H/2, W/2) in pipeline_s2d
        mode — callers pass x_ref.shape, which is already the right one.
        The latent grid sits at /16 of FULL resolution either way."""
        p = self.planes
        z = lambda *s: jnp.zeros(s, dtype=self.dtype)
        if self.pipeline_s2d:
            c = 3 * self.s2d * self.s2d
            lat = 16 // self.s2d
            return ElfvcState(
                x_ref_ref=z(batch, height, width, c),
                motion_info_prior=z(batch, height, width, c),
                q_y_prior_motion=z(batch, height // lat, width // lat, p),
                q_y_prior_res=z(batch, height // lat, width // lat, p),
            )
        return ElfvcState(
            x_ref_ref=z(batch, height, width, 3),
            motion_info_prior=z(batch, height, width, 3),
            q_y_prior_motion=z(batch, height // 16, width // 16, p),
            q_y_prior_res=z(batch, height // 16, width // 16, p),
        )

    def forward_inter(self, x_cur, x_ref, state: ElfvcState, training: bool, rng=None):
        rngs = jax.random.split(rng, 2) if rng is not None else (None, None)

        # flow initial prediction from decoded context (models.py:2087-2088)
        motion_info_local = self.flow_predictor(
            jnp.concatenate([x_ref, state.x_ref_ref, state.motion_info_prior], axis=-1)
        )
        # one scale-space volume per frame, warped twice (local prediction
        # here + decoded motion below) — the volume build is the expensive
        # half of forward_prediction
        volume = self.make_volume(x_ref)
        x_pred_local = self.warp_prediction(volume, motion_info_local)

        # code motion conditioned on the local prediction (models.py:2091-2092)
        y_motion = self.motion_encoder(jnp.concatenate([x_cur, x_pred_local], axis=-1))
        y_motion_hat, motion_lik, q_prior_m = self.motion_hyperprior(
            y_motion, training=training, rng=rngs[0], q_y_prior=state.q_y_prior_motion
        )

        # decoded motion = prior + delta (models.py:2095-2097)
        motion_info_delta = self.motion_decoder(y_motion_hat)
        motion_info = state.motion_info_prior + motion_info_delta
        x_pred = self.warp_prediction(volume, motion_info)

        x_res = x_cur - x_pred
        y_res = self.res_encoder(x_res)
        y_res_hat, res_lik, q_prior_r = self.res_hyperprior(
            y_res, training=training, rng=rngs[1], q_y_prior=state.q_y_prior_res
        )
        x_res_hat = self.res_decoder(jnp.concatenate([y_res_hat, y_motion_hat], axis=-1))
        x_rec = x_pred + x_res_hat

        new_state = ElfvcState(
            x_ref_ref=jax.lax.stop_gradient(x_ref),
            motion_info_prior=jax.lax.stop_gradient(motion_info),
            q_y_prior_motion=(
                q_prior_m if q_prior_m is not None else state.q_y_prior_motion
            ),
            q_y_prior_res=(
                q_prior_r if q_prior_r is not None else state.q_y_prior_res
            ),
        )

        pred_err = []
        q_err = []
        for lik in (motion_lik, res_lik):
            if self.super_prec and lik["pred_err_y"] is not None:
                pred_err.append(lik["pred_err_y"])
            if lik["Q_err_y"] is not None:
                q_err.append(lik["Q_err_y"])
        out = {
            "motion": motion_lik,
            "residual": res_lik,
            "pred_err": pred_err,
            "Q_err": q_err,
        }
        return x_rec, out, new_state

    def aux_loss(self):
        return (
            self.img_hyperprior.aux_loss()
            + self.motion_hyperprior.aux_loss()
            + self.res_hyperprior.aux_loss()
        )
