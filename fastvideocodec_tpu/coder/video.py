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

import functools

import jax
import jax.numpy as jnp
import numpy as np

from fastvideocodec_tpu.coder.service import BitEstimatorCodec, LaplaceCodec
from fastvideocodec_tpu.models.registry import CodecSpec
from fastvideocodec_tpu.ops.warp import exact_warp


def _exact_warp_semantics(fn):
    """Real-bitstream paths force the backend-independent XLA warp: the
    Pallas kernel's displacement clamp would make a TPU-encoded stream
    decode differently on CPU (or vice versa), breaking decode==encode."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with exact_warp():
            return fn(*args, **kwargs)

    return wrapped


def _apply(spec, params, fn, *args):
    return spec.module.apply(params, *args, method=fn)


def _codecs_from_params(params):
    p = params["params"]
    mv_codec = BitEstimatorCodec(p["bit_estimator_mv"])
    z_codec = BitEstimatorCodec(p["bit_estimator_z"])
    feat_codec = LaplaceCodec()
    return mv_codec, z_codec, feat_codec


@_exact_warp_semantics
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


@_exact_warp_semantics
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


# ---------------------------------------------------------------------------
# SSF-family real bitstreams (SSF / ELFVC / MCVC share the hyperprior shape)
# ---------------------------------------------------------------------------


class HyperpriorCoder:
    """Real coding for one SSFHyperprior (reference Hyperprior,
    models.py:1958-1999): z via the factorized bottleneck tables, y via the
    scale-table Gaussian coder with decoded (scales, means)."""

    def __init__(self, spec, params, name: str):
        from fastvideocodec_tpu.coder.service import FactorizedCodec, GaussianCodec

        self.spec = spec
        self.params = params
        self.name = name
        p = params["params"][name]["bottleneck"]
        self.z_codec = FactorizedCodec({k: np.asarray(v) for k, v in p.items()})
        self.y_codec = GaussianCodec()

    def _sub(self, fn, *args):
        m = self.spec.module

        def call(mod, *a):
            return fn(getattr(mod, self.name), *a)

        return m.apply(self.params, *args, method=call)

    def compress(self, y):
        z = self._sub(lambda hp, yy: hp.hyper_encoder(yy), y)
        z_stream = self.z_codec.compress(np.asarray(z))
        z_hat = jnp.asarray(self.z_codec.decompress(z_stream, z.shape))
        scales = self._sub(lambda hp, zz: hp.hyper_decoder_scale(zz), z_hat)
        means = self._sub(lambda hp, zz: hp.hyper_decoder_mean(zz), z_hat)
        scales = scales[:, : y.shape[1], : y.shape[2], :]
        means = means[:, : y.shape[1], : y.shape[2], :]
        y_stream = self.y_codec.compress(
            np.asarray(y), np.asarray(scales), np.asarray(means)
        )
        y_hat = jnp.round(y - means) + means
        return {"z": z_stream, "y": y_stream, "z_shape": tuple(z.shape)}, y_hat

    def decompress(self, streams, y_shape):
        z_hat = jnp.asarray(self.z_codec.decompress(streams["z"], streams["z_shape"]))
        scales = self._sub(lambda hp, zz: hp.hyper_decoder_scale(zz), z_hat)
        means = self._sub(lambda hp, zz: hp.hyper_decoder_mean(zz), z_hat)
        scales = scales[:, : y_shape[1], : y_shape[2], :]
        means = means[:, : y_shape[1], : y_shape[2], :]
        y_hat = jnp.asarray(
            self.y_codec.decompress(streams["y"], np.asarray(scales), np.asarray(means))
        ).reshape(y_shape)
        return y_hat


@_exact_warp_semantics
def ssf_compress_gop(spec: CodecSpec, params, gop: jax.Array):
    """ScaleSpaceFlow real-bitstream encode: keyframe + inter chain
    (reference compress path of SSF models). gop: [T, B, H, W, 3].

    Returns (streams, recon [T, B, H, W, 3], total_bits)."""
    m = spec.module
    img_hp = HyperpriorCoder(spec, params, "img_hyperprior")
    mot_hp = HyperpriorCoder(spec, params, "motion_hyperprior")
    res_hp = HyperpriorCoder(spec, params, "res_hyperprior")

    y0 = m.apply(params, gop[0], method=lambda mod, x: mod.img_encoder(x))
    key_streams, y0_hat = img_hp.compress(y0)
    x_ref = m.apply(params, y0_hat, method=lambda mod, y: mod.img_decoder(y))

    frames = [x_ref]
    inter_streams = []
    for t in range(1, gop.shape[0]):
        x_cur = gop[t]
        y_mot = m.apply(
            params, jnp.concatenate([x_cur, x_ref], axis=-1),
            method=lambda mod, x: mod.motion_encoder(x),
        )
        mot_s, y_mot_hat = mot_hp.compress(y_mot)
        x_pred = m.apply(
            params, x_ref, y_mot_hat,
            method=lambda mod, r, ym: mod.forward_prediction(r, mod.motion_decoder(ym)),
        )
        y_res = m.apply(
            params, x_cur - x_pred, method=lambda mod, x: mod.res_encoder(x)
        )
        res_s, y_res_hat = res_hp.compress(y_res)
        x_ref = x_pred + m.apply(
            params, jnp.concatenate([y_res_hat, y_mot_hat], axis=-1),
            method=lambda mod, y: mod.res_decoder(y),
        )
        frames.append(x_ref)
        inter_streams.append(
            {"motion": mot_s, "residual": res_s,
             "y_mot_shape": tuple(y_mot.shape), "y_res_shape": tuple(y_res.shape)}
        )
    streams = {"keyframe": key_streams, "y0_shape": tuple(y0.shape),
               "inter": inter_streams}
    bits = 8 * (
        len(key_streams["z"]) + len(key_streams["y"])
        + sum(len(s["motion"]["z"]) + len(s["motion"]["y"])
              + len(s["residual"]["z"]) + len(s["residual"]["y"])
              for s in inter_streams)
    )
    return streams, jnp.stack(frames), bits


@_exact_warp_semantics
def ssf_decompress_gop(spec: CodecSpec, params, streams: dict):
    """Reconstructs the whole GOP from bitstreams only."""
    m = spec.module
    img_hp = HyperpriorCoder(spec, params, "img_hyperprior")
    mot_hp = HyperpriorCoder(spec, params, "motion_hyperprior")
    res_hp = HyperpriorCoder(spec, params, "res_hyperprior")

    y0_hat = img_hp.decompress(streams["keyframe"], streams["y0_shape"])
    x_ref = m.apply(params, y0_hat, method=lambda mod, y: mod.img_decoder(y))
    frames = [x_ref]
    for s in streams["inter"]:
        y_mot_hat = mot_hp.decompress(s["motion"], s["y_mot_shape"])
        x_pred = m.apply(
            params, x_ref, y_mot_hat,
            method=lambda mod, r, ym: mod.forward_prediction(r, mod.motion_decoder(ym)),
        )
        y_res_hat = res_hp.decompress(s["residual"], s["y_res_shape"])
        x_ref = x_pred + m.apply(
            params, jnp.concatenate([y_res_hat, y_mot_hat], axis=-1),
            method=lambda mod, y: mod.res_decoder(y),
        )
        frames.append(x_ref)
    return jnp.stack(frames)


# ---------------------------------------------------------------------------
# RLVC real bitstreams (recurrent: factorized first P-frame, RPM after)
# ---------------------------------------------------------------------------


def _rlvc_codec_real(spec, params, codec_name, dec4_name, x, rae_hidden,
                     rpm_hidden, rpm_flag, prior_latent, fcodec, gcodec):
    """One Coder2D pass with real entropy coding (reference
    compress_slow/decompress_slow fused, entropy_models.py:97-148)."""
    m = spec.module

    def enc(mod, xx, se):
        return getattr(mod, codec_name).encode(xx, se)

    def dec(mod, lh, sd):
        c = getattr(mod, codec_name)
        return c.decode(lh, sd, None, getattr(mod, dec4_name))

    def rpm_net(mod, pl, rh):
        return getattr(mod, codec_name).entropy.rpm(pl, rh)

    state_enc, state_dec = jnp.split(rae_hidden, 2, axis=-1)
    latent, state_enc = m.apply(params, x, state_enc, method=enc)
    if rpm_flag:
        sigma_raw, mu, rpm_hidden = m.apply(params, prior_latent, rpm_hidden, method=rpm_net)
        sigma = jnp.exp(jnp.maximum(sigma_raw, -7.0)) / 10.0
        stream = gcodec.compress(np.asarray(latent), np.asarray(sigma), np.asarray(mu))
        latent_hat = jnp.round(latent - mu) + mu
    else:
        stream = fcodec.compress(np.asarray(latent))
        latent_hat = jnp.asarray(fcodec.decompress(stream, latent.shape))
    # prior from the DECODED latent so encoder and decoder states agree
    # (reference compress_slow, entropy_models.py:122)
    prior_latent = jnp.round(latent_hat)
    hat, state_dec = m.apply(params, latent_hat, state_dec, method=dec)
    rae_hidden = jnp.concatenate([state_enc, state_dec], axis=-1)
    return hat, rae_hidden, rpm_hidden, prior_latent, stream, latent_hat.shape


@_exact_warp_semantics
def rlvc_compress_gop(spec: CodecSpec, params, gop: jax.Array):
    """RLVC real-bitstream encode over a GOP [T, H, W, 3] (frame 0 I-coded).

    Returns (streams, recon [T-1, H, W, 3], bits). The decoder reproduces
    hidden/prior states from decoded latents only, mirroring the
    reference's compress_slow/decompress_slow state discipline."""
    from fastvideocodec_tpu.coder.service import FactorizedCodec, GaussianCodec

    m = spec.module
    p = params["params"]
    fmv = FactorizedCodec(
        {k: np.asarray(v) for k, v in p["mv_codec"]["entropy"]["bottleneck"].items()}
    )
    fres = FactorizedCodec(
        {k: np.asarray(v) for k, v in p["res_codec"]["entropy"]["bottleneck"].items()}
    )
    gc = GaussianCodec()

    T, H, W, _ = gop.shape
    hidden = m.init_hidden(1, H, W)
    rae_mv, rae_res = hidden.rae_mv, hidden.rae_res
    rpm_mv, rpm_res = hidden.rpm_mv, hidden.rpm_res
    mv_prior, res_prior = hidden.mv_prior, hidden.res_prior

    x_ref = gop[0][None]
    recon, streams = [], []
    from fastvideocodec_tpu.ops import flow_warp

    latent_shapes = {}
    for t in range(1, T):
        x_cur = gop[t][None]
        flag = t > 1
        mv = m.apply(params, x_cur, x_ref, method=lambda mod, a, b: mod.optic_flow(a, b))
        mv_hat, rae_mv, rpm_mv, mv_prior, mv_stream, mv_shape = _rlvc_codec_real(
            spec, params, "mv_codec", "mv_dec4", mv, rae_mv, rpm_mv, flag,
            mv_prior, fmv, gc,
        )
        x_warp = flow_warp(x_ref, mv_hat)
        x_mc = m.apply(
            params, jnp.concatenate([x_warp, x_ref], axis=-1),
            method=lambda mod, x: mod.warpnet(x),
        ) + x_warp
        res = x_cur - x_mc
        res_hat, rae_res, rpm_res, res_prior, res_stream, res_shape = _rlvc_codec_real(
            spec, params, "res_codec", "res_dec4", res, rae_res, rpm_res, flag,
            res_prior, fres, gc,
        )
        x_ref = jnp.clip(res_hat + x_mc, 0.0, 1.0)
        recon.append(x_ref[0])
        streams.append({"mv": mv_stream, "res": res_stream})
        latent_shapes = {"mv": tuple(mv_shape), "res": tuple(res_shape)}
    bits = 8 * sum(len(s["mv"]) + len(s["res"]) for s in streams)
    return streams, jnp.stack(recon), bits, latent_shapes


def _rlvc_codec_real_decode(spec, params, codec_name, dec4_name, rae_dec_state,
                            rpm_hidden, rpm_flag, prior_latent, latent_shape,
                            stream, fcodec, gcodec):
    m = spec.module

    def dec(mod, lh, sd):
        c = getattr(mod, codec_name)
        return c.decode(lh, sd, None, getattr(mod, dec4_name))

    def rpm_net(mod, pl, rh):
        return getattr(mod, codec_name).entropy.rpm(pl, rh)

    if rpm_flag:
        sigma_raw, mu, rpm_hidden = m.apply(
            params, prior_latent, rpm_hidden, method=rpm_net
        )
        sigma = jnp.exp(jnp.maximum(sigma_raw, -7.0)) / 10.0
        latent_hat = jnp.asarray(
            gcodec.decompress(stream, np.asarray(sigma), np.asarray(mu))
        ).reshape(latent_shape)
    else:
        latent_hat = jnp.asarray(fcodec.decompress(stream, latent_shape))
    prior_latent = jnp.round(latent_hat)
    hat, rae_dec_state = m.apply(params, latent_hat, rae_dec_state, method=dec)
    return hat, rae_dec_state, rpm_hidden, prior_latent


@_exact_warp_semantics
def rlvc_decompress_gop(spec: CodecSpec, params, iframe: jax.Array, streams,
                        latent_shapes):
    """RLVC real-bitstream decode from (I-frame, bitstreams): rebuilds
    recurrent decoder/RPM state from decoded latents only."""
    from fastvideocodec_tpu.coder.service import FactorizedCodec, GaussianCodec
    from fastvideocodec_tpu.ops import flow_warp

    m = spec.module
    p = params["params"]
    fmv = FactorizedCodec(
        {k: np.asarray(v) for k, v in p["mv_codec"]["entropy"]["bottleneck"].items()}
    )
    fres = FactorizedCodec(
        {k: np.asarray(v) for k, v in p["res_codec"]["entropy"]["bottleneck"].items()}
    )
    gc = GaussianCodec()

    H, W = iframe.shape[0], iframe.shape[1]
    hidden = m.init_hidden(1, H, W)
    rae_mv_dec = jnp.split(hidden.rae_mv, 2, axis=-1)[1]
    rae_res_dec = jnp.split(hidden.rae_res, 2, axis=-1)[1]
    rpm_mv, rpm_res = hidden.rpm_mv, hidden.rpm_res
    mv_prior, res_prior = hidden.mv_prior, hidden.res_prior

    x_ref = iframe[None]
    recon = []
    for t, s in enumerate(streams, start=1):
        flag = t > 1
        mv_hat, rae_mv_dec, rpm_mv, mv_prior = _rlvc_codec_real_decode(
            spec, params, "mv_codec", "mv_dec4", rae_mv_dec, rpm_mv, flag,
            mv_prior, latent_shapes["mv"], s["mv"], fmv, gc,
        )
        x_warp = flow_warp(x_ref, mv_hat)
        x_mc = m.apply(
            params, jnp.concatenate([x_warp, x_ref], axis=-1),
            method=lambda mod, x: mod.warpnet(x),
        ) + x_warp
        res_hat, rae_res_dec, rpm_res, res_prior = _rlvc_codec_real_decode(
            spec, params, "res_codec", "res_dec4", rae_res_dec, rpm_res, flag,
            res_prior, latent_shapes["res"], s["res"], fres, gc,
        )
        x_ref = jnp.clip(res_hat + x_mc, 0.0, 1.0)
        recon.append(x_ref[0])
    return jnp.stack(recon)
