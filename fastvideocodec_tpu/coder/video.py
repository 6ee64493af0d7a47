"""Whole-GOP real-bitstream encode/decode for the LSVC tree codec.

Mirrors the reference's TreeFrameReconCompress / TreeFrameReconDecompress
(models.py:1096-1152) with the device/host split made explicit:

encode:  flow + mv analysis (device, all P-frames batched) -> mv symbols to
         the host BitEstimator coder; then per tree layer (log2 GOP stages):
         MC + residual analysis (device) -> z symbols (BitEstimator coder),
         sigma (device) -> feature symbols (Laplace coder) -> reconstruction
         (device) feeding the next layer.
decode:  the mirror image — decode mv, then per layer decode z -> sigma ->
         features -> synthesize + MC.

The decoder consumes ONLY (I-frame, bitstreams), so `decode == encode recon`
is the correctness invariant (reference entropy test, SURVEY.md §4). Host
coding of layer k+1 can overlap device compute of layer k via
coder.AsyncCoder; this function keeps it synchronous for clarity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fastvideocodec_tpu.coder.service import BitEstimatorCodec, LaplaceCodec
from fastvideocodec_tpu.models.registry import CodecSpec


def _apply(spec, params, fn, *args):
    return spec.module.apply(params, *args, method=fn)


def _codecs_from_params(params):
    p = params["params"]
    mv_codec = BitEstimatorCodec(p["bit_estimator_mv"])
    z_codec = BitEstimatorCodec(p["bit_estimator_z"])
    feat_codec = LaplaceCodec()
    return mv_codec, z_codec, feat_codec


def lsvc_compress(spec: CodecSpec, params, gop: jax.Array):
    """gop: [T, H, W, 3] with frame 0 already I-coded.

    Returns (streams dict, recon [T-1, H, W, 3], bits_total)."""
    module = spec.module
    T = gop.shape[0]
    bs = T - 1
    sched = module.schedule(bs)
    mv_codec, z_codec, feat_codec = _codecs_from_params(params)

    target = gop[1:]
    ref_raw = gop[jnp.asarray(sched.ref_index)]

    mv_latent = _apply(
        spec, params, lambda m, t, r: m.mv_encoder(m.optic_flow(t, r)), target, ref_raw
    )
    mv_q = jnp.round(mv_latent)
    mv_stream = mv_codec.compress(np.asarray(mv_q))
    mv_hat = _apply(spec, params, lambda m, q: m.mv_decoder(q), mv_q)

    com = [None] * bs
    z_streams, feat_streams = [], []
    z_shapes, feat_shapes = [], []
    for layer in sched.layers:
        refs = [gop[0] if sched.parents[f] == 0 else com[sched.parents[f] - 1] for f in layer]
        ref = jnp.stack(refs)
        ids = jnp.asarray([f - 1 for f in layer])
        mc, _ = _apply(
            spec, params, lambda m, r, d: m.motioncompensation(r, d), ref, mv_hat[ids]
        )
        res = target[ids] - mc
        feature = _apply(spec, params, lambda m, x: m.res_encoder(x), res)
        z = _apply(spec, params, lambda m, f: m.prior_encoder(f), feature)
        z_q = jnp.round(z)
        z_streams.append(z_codec.compress(np.asarray(z_q)))
        z_shapes.append(tuple(z_q.shape))
        sigma = _apply(spec, params, lambda m, zq: m.prior_decoder(zq), z_q)
        feat_q = jnp.round(feature)
        feat_streams.append(
            feat_codec.compress(np.asarray(feat_q), np.asarray(sigma))
        )
        feat_shapes.append(tuple(feat_q.shape))
        res_hat = _apply(spec, params, lambda m, fq: m.res_decoder(fq), feat_q)
        com_frames = jnp.clip(res_hat + mc, 0.0, 1.0)
        for i, f in enumerate(layer):
            com[f - 1] = com_frames[i]

    recon = jnp.stack(com)
    streams = {
        "mv": mv_stream,
        "mv_shape": tuple(mv_q.shape),
        "z": z_streams,
        "z_shapes": z_shapes,
        "features": feat_streams,
        "feat_shapes": feat_shapes,
    }
    bits = (
        len(mv_stream) + sum(len(s) for s in z_streams)
        + sum(len(s) for s in feat_streams)
    ) * 8
    return streams, recon, bits


def lsvc_decompress(spec: CodecSpec, params, iframe: jax.Array, streams: dict,
                    num_p_frames: int):
    """Reconstructs P-frames from (I-frame, bitstreams) only."""
    module = spec.module
    sched = module.schedule(num_p_frames)
    mv_codec, z_codec, feat_codec = _codecs_from_params(params)

    mv_q = jnp.asarray(
        mv_codec.decompress(streams["mv"], streams["mv_shape"])
    )
    mv_hat = _apply(spec, params, lambda m, q: m.mv_decoder(q), mv_q)

    com = [None] * num_p_frames
    for li, layer in enumerate(sched.layers):
        refs = [iframe if sched.parents[f] == 0 else com[sched.parents[f] - 1] for f in layer]
        ref = jnp.stack(refs)
        ids = jnp.asarray([f - 1 for f in layer])
        mc, _ = _apply(
            spec, params, lambda m, r, d: m.motioncompensation(r, d), ref, mv_hat[ids]
        )
        z_q = jnp.asarray(z_codec.decompress(streams["z"][li], streams["z_shapes"][li]))
        sigma = _apply(spec, params, lambda m, zq: m.prior_decoder(zq), z_q)
        feat_q = jnp.asarray(
            feat_codec.decompress(
                streams["features"][li], np.asarray(sigma)
            ).reshape(streams["feat_shapes"][li])
        )
        res_hat = _apply(spec, params, lambda m, fq: m.res_decoder(fq), feat_q)
        com_frames = jnp.clip(res_hat + mc, 0.0, 1.0)
        for i, f in enumerate(layer):
            com[f - 1] = com_frames[i]
    return jnp.stack(com)
