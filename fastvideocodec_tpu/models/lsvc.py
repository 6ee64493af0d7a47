"""LSVC ("Hermes"): tree-structured layered codec — the reference's core
contribution (models.py:1157-1411).

All P-frames of a GOP are coded against a binary reference tree instead of
a chain: optical flow and motion coding run for EVERY P-frame in one batch
(flow targets are the raw tree parents, available at encode time); then
motion compensation + residual coding proceed layer by layer (depth =
log2(GOP)), each layer fully batched.

TPU mapping: the tree schedule is static per GOP size, so each layer is a
fixed gather + one batched conv stack — XLA sees log2(GOP) sequential
stages of large MXU-friendly batches (SURVEY.md §3.3). Rates are Laplace
(residual feature, sigma from the hyper decoder) + BitEstimator (z, mv),
exactly the reference's iclr18 estimators (models.py:1216-1299).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from fastvideocodec_tpu.entropy.bit_estimator import BitEstimator
from fastvideocodec_tpu.gop.graph import TreeSchedule, tree_schedule
from fastvideocodec_tpu.layers.blocks import WarpNet, WarpNetTPU
from fastvideocodec_tpu.layers.spynet import SpyNet
from fastvideocodec_tpu.layers.transforms import (
    OUT_CHANNEL_N,
    AnalysisMVNet,
    AnalysisNet,
    AnalysisPriorNet,
    SynthesisMVNet,
    SynthesisNet,
    SynthesisPriorNet,
)
from fastvideocodec_tpu.ops import (
    avg_pool2,
    bilinear_upsample_x2,
    bits_estimate,
    depth_to_space,
    flow_warp,
    flow_warp_fullres_s2d,
    laplace_likelihood,
    quantize,
    space_to_depth,
)


class LSVC(nn.Module):
    """__call__(x: [T, H, W, 3]) codes the whole GOP (frame 0 = I-frame).

    `s2d=2` selects the TPU-native "LSVC-TPU" configuration (new in this
    framework, ROADMAP round-2 item 1): the codec runs entirely in a
    space-to-depth domain ([H/2, W/2, 12] frames), flow is estimated by
    SpyNet on the 2x2-average-pooled RGB pyramid (3-channel warps are 4x
    cheaper than 12-channel ones and pooling needs no parameters), motion
    compensation warps the s2d reconstruction with a bounded displacement,
    and the synthesis transform emits 12 channels that depth-to-space back
    to full resolution. Convs never see a 3-channel full-resolution
    tensor, which starves the MXU's 128 lanes; transform stages drop from
    4 to 3 so latents sit at the same /16 of full resolution as the
    reference. MSE in the s2d domain equals full-resolution MSE exactly
    (s2d is a permutation), so the RD objective is unchanged."""

    channels: int = 128          # mv latent channels ('-128' variant)
    use_attn: bool = False       # '-A': attention in analysis transforms
    use_syn_attn: bool = False   # '-S': attention in synthesis transforms
    graph: str = "tree"          # 'tree' | 'chain' ('-L') | 'onehop' ('-O')
    detach_tree: bool = False    # '-D': stop-gradient between tree layers
    attn_depth: int = 12         # reference uses 12 attention blocks
    per_layer_mv: bool = False   # stage flow/mv coding per tree layer:
    # same math/bits (flow still targets RAW parents), but peak activation
    # memory drops ~2x — needed for whole-GOP 1080p on one 16GB chip
    layer_chunk: int = 0         # >0: split tree layers into chunks of at
    # most this many frames (sequential); bounds peak HBM at high res
    s2d: int = 1                 # 2: TPU-native space-to-depth domain
    spynet_widths: tuple = (32, 64, 32, 16)
    spynet_kernel: int = 7
    spynet_kernels: tuple = ()   # per-level kernel sizes, coarsest first
    spynet_s2d_levels: int = 0   # finest-N s2d-domain towers (spynet.py)
    conv_channels: int = 0       # 0: family defaults (N=64 res, 128 mv)
    warp_width: int = 64         # WarpNet trunk width
    warp_tpu: bool = False       # use the strided-trunk WarpNetTPU
    warp_stride: int = 4         # WarpNetTPU stem stride (trunk at /stride)
    warp_pooled: bool = False    # '-QU': run the reference-shape U-net one
    # resolution down (avg-pool input, bilinear-upsample its correction;
    # the residual add keeps the warped frame's full detail) — the decode-
    # headroom middle ground between the U-net and the rejected '-WT'
    mv_polyphase_out: bool = False  # SynthesisMVNet polyphase output stage
    mc_displacement: int = 0     # >0: bound MC-warp displacement (Pallas
    # halo radius, in MC-warp-domain pixels); 0 = backend default
    frame_axis: str = ""         # mesh axis name to shard the per-layer
    # frame batches over (SURVEY §2.7 'sequence parallel' = the LSVC tree
    # layers; reference analog models.py:1363-1394's DataParallel decoder
    # wraps). When set, the whole-GOP forward annotates the stage-1 flow/mv
    # batch and every tree layer's frame batch with
    # with_sharding_constraint(P(frame_axis)) so GSPMD keeps frames of a
    # layer on distinct chips (parent gathers become ICI collectives).
    # Requires tracing inside a Mesh context that defines the axis; '' = no
    # constraints (single-chip / other-axis runs unchanged). Use
    # parallel.frame.frame_sharded_spec to derive a sharded spec.
    full_res_warp: bool = False  # s2d>1 only: run the MC warp at FULL
    # resolution (d2s ref -> 3ch warp with x2-upsampled flow -> s2d back).
    # The s2d-domain warp moves whole 2x2 pixel blocks rigidly — odd
    # full-res displacements are inexpressible — which costs RD on
    # content with fine motion; this restores the reference's exact warp
    # semantics (models.py:730-752) while the refinement + residual
    # pipeline stays in the cheap s2d domain.
    mv_full_res_out: bool = False  # '-F2' (implies full_res_warp, s2d>1):
    # the mv decoder emits the FULL-resolution flow field itself
    # (polyphase_factor=4 from the s2d trunk) instead of bilinearly
    # upsampling the half-res flow — odd per-pixel displacements become
    # decoder-expressible at negligible cost (the final conv widens from
    # 8 to 32 output channels at quarter resolution).
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        dt = self.dtype
        self.optic_flow = SpyNet(
            widths=self.spynet_widths, kernel=self.spynet_kernel,
            kernels=self.spynet_kernels, s2d_levels=self.spynet_s2d_levels,
            dtype=dt,
        )
        d = self.attn_depth
        stages = 4 if self.s2d == 1 else 3
        res_c = self.conv_channels or OUT_CHANNEL_N
        img_c = 3 * self.s2d * self.s2d
        self.mv_encoder = AnalysisMVNet(
            use_attn=self.use_attn, conv_channels=self.channels,
            out_channels=self.channels, stages=stages, attn_depth=d, dtype=dt,
        )
        self.mv_decoder = SynthesisMVNet(
            use_attn=self.use_syn_attn, conv_channels=self.channels,
            stages=stages, attn_depth=d,
            polyphase_out=self.mv_polyphase_out or self.mv_full_res_out,
            polyphase_factor=4 if self.mv_full_res_out else 2,
            dtype=dt,
        )
        self.res_encoder = AnalysisNet(
            conv_channels=res_c, stages=stages,
            use_attn=self.use_attn, attn_depth=d, dtype=dt,
        )
        self.res_decoder = SynthesisNet(
            conv_channels=res_c, out_channels=img_c, stages=stages,
            use_attn=self.use_syn_attn, attn_depth=d, dtype=dt,
        )
        self.prior_encoder = AnalysisPriorNet(
            use_attn=self.use_attn, attn_depth=d, dtype=dt
        )
        self.prior_decoder = SynthesisPriorNet(
            use_attn=self.use_syn_attn, attn_depth=d, dtype=dt
        )
        self.bit_estimator_mv = BitEstimator(self.channels)
        self.bit_estimator_z = BitEstimator(OUT_CHANNEL_N)
        if self.warp_tpu:
            self.warpnet = WarpNetTPU(
                out_channels=img_c, width=self.warp_width,
                stem_stride=self.warp_stride, dtype=dt,
            )
        else:
            self.warpnet = WarpNet(
                out_channels=img_c, width=self.warp_width, dtype=dt
            )

    def schedule(self, bs: int) -> TreeSchedule:
        return tree_schedule(
            bs, is_linear=self.graph == "chain", is_onehop=self.graph == "onehop"
        )

    def motioncompensation(self, ref, mv):
        r = self.mc_displacement if self.mc_displacement > 0 else None
        if self.full_res_warp and self.s2d > 1:
            if self.mv_full_res_out:  # decoder already emits full-res flow
                mv_full = 2.0 * mv
            else:
                mv_full = 2.0 * bilinear_upsample_x2(mv)
            # fused layout: the d2s/s2d round trip folds into the Pallas
            # kernel's planarize/untile relayouts (ops.flow_warp_fullres_s2d;
            # value-identical to d2s -> flow_warp -> s2d)
            warped = flow_warp_fullres_s2d(
                ref, mv_full,
                max_displacement=None if r is None else 2 * r,
            )
        else:
            warped = flow_warp(ref, mv, max_displacement=r)
        inp = jnp.concatenate([warped, ref], axis=-1)
        if self.warp_pooled:
            corr = bilinear_upsample_x2(self.warpnet(avg_pool2(inp)))
            pred = corr + warped
        else:
            pred = self.warpnet(inp) + warped
        return pred, warped

    def res_codec(self, res, training, rng):
        """Residual codec with Laplace-sigma hyperprior (models.py:1301-1333)."""
        rngs = jax.random.split(rng, 2) if rng is not None else (None, None)
        feature = self.res_encoder(res)
        z = self.prior_encoder(feature)
        z_q = quantize(z, training, rngs[0])
        sigma = self.prior_decoder(z_q)
        feature_q = quantize(feature, training, rngs[1])
        res_hat = self.res_decoder(feature_q)
        bits = bits_estimate(laplace_likelihood(feature_q, sigma)) + bits_estimate(
            self.bit_estimator_z.likelihood(z_q)
        )
        return res_hat, bits

    def mv_codec(self, mv, training, rng):
        latent = self.mv_encoder(mv)
        latent_q = quantize(latent, training, rng)
        mv_hat = self.mv_decoder(latent_q)
        bits = bits_estimate(self.bit_estimator_mv.likelihood(latent_q))
        return mv_hat, bits

    def __call__(self, x, training: bool, rng=None):
        """x: [T, H, W, 3] GOP with the (already-coded) I-frame at index 0.

        Returns (com_frames [T-1,...], mc_frames, warped_frames, metrics).
        """
        T, H, W, _ = x.shape
        bs = T - 1
        sched = self.schedule(bs)

        def frames_sharded(t):
            """Pin a [frames, ...] batch's leading axis to the mesh frame
            axis (no-op unless frame_axis is configured)."""
            if not self.frame_axis:
                return t
            from jax.sharding import PartitionSpec as P

            return jax.lax.with_sharding_constraint(t, P(self.frame_axis))

        rngs = (
            jax.random.split(rng, 1 + sched.depth)
            if rng is not None
            else [None] * (1 + sched.depth)
        )

        # TPU s2d domain: the codec state (targets, refs, recons) lives at
        # [H/2, W/2, 12]; flow estimation uses the avg-pooled RGB frames
        # (same spatial resolution, 4x cheaper warps, no parameters).
        if self.s2d > 1:
            x_flow = avg_pool2(x)  # [T, H/2, W/2, 3]
            x = space_to_depth(x, self.s2d)
        else:
            x_flow = x

        # Stage 1 (fully batched): flow for ALL P-frames vs raw tree parents
        # + motion coding in one batch (models.py:1354-1355). With
        # per_layer_mv the same computation runs inside the layer loop on
        # layer-sized batches instead (identical outputs, lower peak HBM).
        target = x[1:]
        if not self.per_layer_mv:
            ref_raw = frames_sharded(x_flow[jnp.asarray(sched.ref_index)])
            est_mv = self.optic_flow(frames_sharded(x_flow[1:]), ref_raw)
            mv_hat, bits_mv = self.mv_codec(est_mv, training, rngs[0])
            mv_hat = frames_sharded(mv_hat)
        else:
            mv_hat, bits_mv = None, 0.0

        # Stage 2: per tree layer, batched MC + residual coding against
        # *reconstructed* parents (models.py:1363-1394).
        com = [None] * bs
        mc = [None] * bs
        warped = [None] * bs
        bits_res = 0.0
        for li, layer in enumerate(sched.layers):
            chunk = self.layer_chunk if self.layer_chunk > 0 else len(layer)
            for ci in range(0, len(layer), chunk):
                part = layer[ci : ci + chunk]
                refs = []
                for fid in part:
                    parent = sched.parents[fid]
                    refs.append(x[0] if parent == 0 else com[parent - 1])
                ref = frames_sharded(jnp.stack(refs))
                if self.detach_tree or self.graph == "chain":
                    ref = jax.lax.stop_gradient(ref)
                ids = jnp.asarray([fid - 1 for fid in part])
                tgt = frames_sharded(target[ids])
                if self.per_layer_mv:
                    ref_raw = x_flow[
                        jnp.asarray([sched.ref_index[fid - 1] for fid in part])
                    ]
                    est_mv = self.optic_flow(x_flow[1:][ids], ref_raw)
                    diff, mv_bits_l = self.mv_codec(
                        est_mv, training, rngs[0] if rngs[0] is None else
                        jax.random.fold_in(rngs[0], li * 64 + ci)
                    )
                    bits_mv = bits_mv + mv_bits_l
                else:
                    diff = mv_hat[ids]

                mc_frames, warped_frames = self.motioncompensation(ref, diff)
                res = tgt - mc_frames
                res_hat, rb = self.res_codec(res, training, rngs[1 + li])
                com_frames = jnp.clip(res_hat + mc_frames, 0.0, 1.0)
                bits_res = bits_res + rb
                for i, fid in enumerate(part):
                    com[fid - 1] = com_frames[i]
                    mc[fid - 1] = mc_frames[i]
                    warped[fid - 1] = warped_frames[i]

        com_frames = jnp.stack(com)
        mc_frames = jnp.stack(mc)
        warped_frames = jnp.stack(warped)

        # losses in the s2d domain equal the full-resolution values exactly
        # (space_to_depth is a permutation of pixels)
        rec_loss = jnp.mean((com_frames - target) ** 2)
        warp_loss = jnp.mean((warped_frames - target) ** 2)
        mc_loss = jnp.mean((mc_frames - target) ** 2)
        denom = bs * H * W

        if self.s2d > 1:
            com_frames = depth_to_space(com_frames, self.s2d)
            mc_frames = depth_to_space(mc_frames, self.s2d)
            warped_frames = depth_to_space(warped_frames, self.s2d)
        metrics = {
            "rec_loss": rec_loss,
            "warp_loss": warp_loss,
            "mc_loss": mc_loss,
            "bpp_res": bits_res / denom,
            "bpp_mv": bits_mv / denom,
            "bpp": (bits_res + bits_mv) / denom,
        }
        return com_frames, mc_frames, warped_frames, metrics

    # Real-bitstream decode lives in coder/video.py (lsvc_decompress):
    # host-decoded latents are consumed layer by layer, mirroring
    # TreeFrameReconDecompress (models.py:1129-1152).

    def aux_loss(self):
        return jnp.zeros(())
