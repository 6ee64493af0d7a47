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
is the correctness invariant (reference entropy test, SURVEY.md §4). The
encoder's host coding runs on coder.AsyncCoder threads: the device-side
tree recursion never waits on the range coder (layer k's symbols encode
while layer k+1 reconstructs), since reconstructions depend on quantized
latents, not on their bitstreams.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from fastvideocodec_tpu.coder.service import BitEstimatorCodec, LaplaceCodec
from fastvideocodec_tpu.models.registry import CodecSpec
from fastvideocodec_tpu.ops.warp import (
    avg_pool2,
    depth_to_space,
    exact_warp,
    space_to_depth,
)


def _exact_warp_semantics(fn):
    """Real-bitstream paths default to the backend-independent XLA warp:
    the Pallas kernel's displacement clamp would make a TPU-encoded stream
    decode differently on CPU (or vice versa), breaking decode==encode.

    FVC_CODER_WARP=native opts into the kernel for SAME-DEVICE
    encode+decode (the kernel is deterministic, so encoder and decoder
    reproduce each other's motion compensation exactly when both run it on
    identical shapes/backend — the identity tests still hold); use it when
    the producer and consumer share the deployment, e.g. the live-analytics
    loop, or to measure the honest on-chip real-bits fps
    (tools/real_bits_fps.py). Streams meant to cross devices must keep the
    exact default."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        if os.environ.get("FVC_CODER_WARP", "exact") == "native":
            return fn(*args, **kwargs)
        with exact_warp():
            return fn(*args, **kwargs)

    return wrapped


_JITTED: dict = {}
_WARMED: set = set()


def _shape_sig(args):
    return tuple(
        (tuple(a.shape), str(a.dtype)) if hasattr(a, "shape")
        else _shape_sig(a) if isinstance(a, (list, tuple))
        else type(a).__name__
        for a in args
    )


def _run_warm(jf, warm_key, *args):
    """Execute jf, double-executing the FIRST call per shape signature.

    The decode==encode invariant needs run-to-run determinism, but the
    very first execution of a freshly compiled program has been observed
    (TPU v5e via the axon relay, 2026-08-17) to return garbage in a
    corner patch at large buffer sizes (e.g. rows 481-511 x cols 871-1023
    of a [1,512,1024,12] motion-compensation output) while every
    subsequent execution is deterministic and correct. Discarding the
    first-per-shape result costs one duplicate execution (amortized ~0 —
    compilation already dominated that call) and removes the failure mode
    on affected runtimes; on healthy runtimes it is a no-op cost."""
    key = (warm_key, _shape_sig(args))
    if key not in _WARMED:
        # warm with PERTURBED array args: execution caches/memoizers must
        # not be able to serve the warm-up result for the real call
        warm_args = tuple(
            a * 1.0009765625 if hasattr(a, "shape") and hasattr(a, "dtype")
            and jnp.issubdtype(a.dtype, jnp.floating) and a.ndim > 0 else a
            for a in args
        )
        _sync(jf(*warm_args))
        _WARMED.add(key)
    out = jf(*args)
    # Serialize every real-bits net call with an honest host sync. On the
    # remote-relay runtime, successive un-synced executions have been
    # observed to race (deterministic tail-region corruption at large
    # shapes breaking decode==encode; the same call sequence is clean when
    # each result is host-read first). block_until_ready is NOT a reliable
    # sync there — only a host scalar read is. On a local TPU runtime this
    # costs microseconds on a path that is host-bound anyway (the range
    # coder consumes full tensors between net calls).
    _sync(out)
    return out


def _sync(out):
    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            float(jnp.mean(leaf.astype(jnp.float32)))
            break


def _apply(spec, params, fn, *args):
    """jit-cached per (module, method): the real-bits paths call small net
    pieces once per frame/layer, and an eager ``module.apply`` would both
    retrace per call and execute op-by-op (disastrous over a device
    relay). Flax modules hash by config, so equal specs share cache
    entries — call sites must pass module-level named functions, never
    fresh lambdas (a fresh lambda is a fresh key = a recompile)."""
    key = (spec.module, fn)
    jf = _JITTED.get(key)
    if jf is None:
        jf = jax.jit(functools.partial(spec.module.apply, method=fn))
        _JITTED[key] = jf
    return _run_warm(jf, key, params, *args)


# Named method wrappers for the jit cache (see _apply).
def _m_mv_encode_flow(m, t, r):
    return m.mv_encoder(m.optic_flow(t, r))


def _m_mv_decoder(m, q):
    return m.mv_decoder(q)


def _m_lsvc_mv_encode(m, t, r):
    # rounded int16 symbols straight out of the program: no eager round
    # dispatch, half the relay transfer (see _m_lsvc_layer)
    return jnp.round(m.mv_encoder(m.optic_flow(t, r))).astype(jnp.int16)


def _m_lsvc_mv_decoder(m, q_i16):
    return m.mv_decoder(q_i16.astype(jnp.float32))


def _m_motioncompensation(m, r, d):
    return m.motioncompensation(r, d)


def _m_res_encoder(m, x):
    return m.res_encoder(x)


def _m_res_decoder(m, fq):
    return m.res_decoder(fq)


def _m_prior_encoder(m, f):
    return m.prior_encoder(f)


# Fused LSVC layer programs (round-5 host-round-trip cut). The decode==
# encode identity requires every tensor that BOTH sides derive (com, the
# Laplace sigmas, mv_hat) to come from the SAME compiled program —
# recomputing e.g. motioncompensation inside two differently-fused
# graphs can differ in the last bf16 ulp, which for sigma means a
# different CDF table and a corrupted stream. Hence:
#   - _m_lsvc_layer: the shared reconstruction program (one call per
#     tree layer on both sides),
#   - _m_lsvc_sigmas: one BATCHED prior_decoder call over every layer's
#     z_q (encode runs it once at the end for the host coder; decode
#     once at the start) — same program, same inputs, identical bytes,
#   - _m_lsvc_analyze: encoder-only analysis (its internal mc may fuse
#     differently from the shared layer's — harmless, it only shapes
#     what gets quantized, not how both sides reconstruct).
def _m_lsvc_layer(m, refs, mv_hat_l, feat_q_i16):
    # symbols travel as int16 (the tunneled relay's host<->device
    # bandwidth is the real-bits floor; f32 symbol tensors doubled it) —
    # cast inside the shared program so encode (device int16 from
    # analyze) and decode (uploaded int16) run the identical graph
    ref = jnp.stack(refs)
    mc, _ = m.motioncompensation(ref, mv_hat_l)
    feat_q = feat_q_i16.astype(mc.dtype)
    return jnp.clip(m.res_decoder(feat_q) + mc, 0.0, 1.0)


def _m_lsvc_analyze(m, refs, mv_hat_l, tgt):
    ref = jnp.stack(refs)
    mc, _ = m.motioncompensation(ref, mv_hat_l)
    feature = m.res_encoder(tgt - mc)
    z_q = jnp.round(m.prior_encoder(feature))
    return z_q.astype(jnp.int16), jnp.round(feature).astype(jnp.int16)


def _m_lsvc_sigmas(m, z_qs_i16):
    # f16 output: the host Laplace coder quantizes sigma into its scale
    # table; both sides fetch THIS program's f16, so the tables match
    return tuple(
        m.prior_decoder(z.astype(jnp.float32)).astype(jnp.float16)
        for z in z_qs_i16
    )


def _m_prior_decoder(m, zq):
    return m.prior_decoder(zq)


def _m_img_encoder(m, x):
    return m.img_encoder(x)


def _m_img_decoder(m, y):
    return m.img_decoder(y)


def _m_motion_encoder(m, x):
    return m.motion_encoder(x)


def _m_motion_decoder(m, y):
    return m.motion_decoder(y)


def _m_motion_predict(m, r, ym):
    return m.forward_prediction(r, m.motion_decoder(ym))


def _m_forward_prediction(m, r, mi):
    return m.forward_prediction(r, mi)


def _m_flow_predictor(m, x):
    return m.flow_predictor(x)


def _pipe_fold_gop(m, gop):
    """pipeline_s2d boundary for the SSF-family coder paths: fold the GOP
    into the s2d domain once; every component call then exchanges s2d
    tensors (the same contract the GOP engine uses)."""
    if getattr(m, "pipeline_s2d", False):
        return jax.vmap(lambda f: space_to_depth(f, m.s2d))(gop)
    return gop


def _pipe_unfold_recon(m, recon):
    if getattr(m, "pipeline_s2d", False):
        return jax.vmap(lambda f: depth_to_space(f, m.s2d))(recon)
    return recon


def _m_backup_img_decoder(m, y):
    return m.backup_img_decoder(y)


def _m_backup_res_decoder(m, y):
    return m.backup_res_decoder(y)


def _m_optic_flow(m, a, b):
    return m.optic_flow(a, b)


def _m_warpnet(m, x):
    return m.warpnet(x)


@functools.lru_cache(maxsize=None)
def _coder2d_fn_cached(codec_name: str, dec4_name: str, which: str):
    """Stable (memoized) Coder2D method functions for the RLVC real-bits
    path, so _apply's (module, fn) jit cache keys stay hot across frames."""
    if which == "enc":
        def fn(mod, xx, se):
            return getattr(mod, codec_name).encode(xx, se)
    elif which == "dec":
        def fn(mod, lh, sd):
            c = getattr(mod, codec_name)
            return c.decode(lh, sd, None, getattr(mod, dec4_name))
    elif which == "rpm":
        def fn(mod, pl, rh):
            return getattr(mod, codec_name).entropy.rpm(pl, rh)
    elif which == "hp_enc":
        def fn(mod, y):
            return getattr(mod, codec_name).entropy.hyper_encode(y)
    else:  # "hp_dec"
        def fn(mod, zh):
            return getattr(mod, codec_name).entropy.hyper_decode(zh)
    return fn


def _coder2d_fn(spec, codec_name: str, dec4_name: str, which: str):
    return _coder2d_fn_cached(codec_name, dec4_name, which)


def _hp_hyper_encoder(hp, y):
    return hp.hyper_encoder(y)


def _hp_dec_scale(hp, z):
    return hp.hyper_decoder_scale(z)


def _hp_dec_mean(hp, z):
    return hp.hyper_decoder_mean(z)


def _hp_y_predictor(hp, x):
    return hp.y_predictor(x)


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

    # the TPU s2d config codes in the space-to-depth domain; flow comes
    # from the avg-pooled RGB pyramid (models/lsvc.py docstring)
    s2d = getattr(module, "s2d", 1)
    gop_flow = avg_pool2(gop) if s2d > 1 else gop
    if s2d > 1:
        gop = space_to_depth(gop, s2d)

    target = gop[1:]

    mv_q = _apply(
        spec, params, _m_lsvc_mv_encode,
        gop_flow[1:], gop_flow[jnp.asarray(sched.ref_index)],
    )  # int16 symbols (half the relay transfer; round fused in-program)
    # host coding overlaps the device tree recursion: recon depends on the
    # quantized latents only, never on the bytes
    from fastvideocodec_tpu.coder import AsyncCoder

    coder = AsyncCoder(workers=2)
    mv_future = coder.submit(mv_codec.compress, np.asarray(mv_q))
    mv_hat = _apply(spec, params, _m_lsvc_mv_decoder, mv_q)

    # Two fused device calls per tree layer (analyze + the shared recon
    # program — see _m_lsvc_layer's comment for why recon and sigmas must
    # be their own shared programs) instead of five: each _apply is a
    # host round trip costing the relay's ~45 ms floor, and the round
    # trips — not device time — capped real-bits throughput at ~13 fps
    # (VERDICT r4 item 2).
    com = [None] * bs
    z_qs, feat_qs = [], []
    z_futures, z_shapes, feat_shapes = [], [], []
    for layer in sched.layers:
        refs = [gop[0] if sched.parents[f] == 0 else com[sched.parents[f] - 1] for f in layer]
        ids = jnp.asarray([f - 1 for f in layer])
        z_q, feat_q = _apply(
            spec, params, _m_lsvc_analyze, refs, mv_hat[ids], target[ids]
        )
        z_qs.append(z_q)
        feat_qs.append(feat_q)
        z_futures.append(coder.submit(z_codec.compress, np.asarray(z_q)))
        z_shapes.append(tuple(z_q.shape))
        feat_shapes.append(tuple(feat_q.shape))
        com_frames = _apply(
            spec, params, _m_lsvc_layer, refs, mv_hat[ids], feat_q
        )
        for i, f in enumerate(layer):
            com[f - 1] = com_frames[i]

    # one batched sigma call over every layer (the decoder runs the same
    # program, so the Laplace CDF tables match bit for bit); the feature
    # compression itself is async host work
    sigmas = _apply(spec, params, _m_lsvc_sigmas, tuple(z_qs))
    feat_futures = [
        coder.submit(feat_codec.compress, np.asarray(fq), np.asarray(sg))
        for fq, sg in zip(feat_qs, sigmas)
    ]

    recon = jnp.stack(com)
    if s2d > 1:
        recon = depth_to_space(recon, s2d)
    mv_stream = mv_future.result()
    z_streams = [f.result() for f in z_futures]
    feat_streams = [f.result() for f in feat_futures]
    coder.shutdown()
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

    s2d = getattr(module, "s2d", 1)
    if s2d > 1:
        iframe = space_to_depth(iframe[None], s2d)[0]

    mv_q = jnp.asarray(
        mv_codec.decompress(streams["mv"], streams["mv_shape"])
        .astype(np.int16)
    )
    mv_hat = _apply(spec, params, _m_lsvc_mv_decoder, mv_q)

    # every layer's z is independent of the tree recursion: decode them
    # all upfront, derive ALL sigmas in one batched device call (the same
    # program the encoder ran — bitwise-matching CDF tables), then the
    # recursive chain is ONE fused device call per layer (plus the host
    # Laplace decode feeding it) instead of three. Symbols travel int16
    # both ways (transfer bandwidth over the tunneled relay is the
    # real-bits floor).
    z_qs = tuple(
        jnp.asarray(z_codec.decompress(
            streams["z"][li], streams["z_shapes"][li]
        ).astype(np.int16))
        for li in range(len(sched.layers))
    )
    sigmas = _apply(spec, params, _m_lsvc_sigmas, z_qs)
    sigmas_np = [np.asarray(s) for s in sigmas]

    # every layer's feature decode depends only on ITS sigma — run them
    # all on host worker threads now so layer k+1's (often the largest)
    # range decode overlaps layer k's device reconstruction
    from fastvideocodec_tpu.coder import AsyncCoder

    coder = AsyncCoder(workers=4)
    feat_futures = [
        coder.submit(
            lambda li=li: feat_codec.decompress(
                streams["features"][li], sigmas_np[li]
            ).astype(np.int16).reshape(streams["feat_shapes"][li])
        )
        for li in range(len(sched.layers))
    ]

    com = [None] * num_p_frames
    for li, layer in enumerate(sched.layers):
        refs = [iframe if sched.parents[f] == 0 else com[sched.parents[f] - 1] for f in layer]
        ids = jnp.asarray([f - 1 for f in layer])
        feat_q = jnp.asarray(feat_futures[li].result())
        com_frames = _apply(
            spec, params, _m_lsvc_layer, refs, mv_hat[ids], feat_q
        )
        for i, f in enumerate(layer):
            com[f - 1] = com_frames[i]
    coder.shutdown()
    out = jnp.stack(com)
    if s2d > 1:
        out = depth_to_space(out, s2d)
    return out


# ---------------------------------------------------------------------------
# SSF-family real bitstreams (SSF / ELFVC / MCVC share the hyperprior shape)
# ---------------------------------------------------------------------------


def _resolve_streams(obj):
    """Recursively replace AsyncCoder futures with their bytes."""
    if hasattr(obj, "result") and callable(obj.result):
        return obj.result()
    if isinstance(obj, dict):
        return {k: _resolve_streams(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_resolve_streams(v) for v in obj]
    return obj


class HyperpriorCoder:
    """Real coding for one SSFHyperprior (reference Hyperprior,
    models.py:1958-1999): z via the factorized bottleneck tables, y via the
    scale-table Gaussian coder with decoded (scales, means)."""

    def __init__(self, spec, params, name: str, sp: bool = False, coder=None):
        from fastvideocodec_tpu.coder.service import FactorizedCodec, GaussianCodec

        self.spec = spec
        self.params = params
        self.name = name
        # sp: the hyperprior's SPnet actively replaces y_hat (ELFVC-SP with
        # the stage enabling this branch — models.py:1988-1997); requires
        # the y_predictor params to exist
        self.sp = sp and "y_predictor" in params["params"][name]
        p = params["params"][name]["bottleneck"]
        self.z_codec = FactorizedCodec({k: np.asarray(v) for k, v in p.items()})
        self.y_codec = GaussianCodec()
        # optional AsyncCoder: y-stream coding runs on host threads while
        # the device chain continues (nothing device-side consumes the y
        # bytes — recon derives from round(y - means)); z stays synchronous
        # because z_hat = decompress(compress(z)) feeds means/scales
        self.coder = coder

    def _sub(self, fn, *args):
        # jit-cached per (module, submodule name, fn) — see _apply
        key = (self.spec.module, self.name, fn)
        jf = _JITTED.get(key)
        if jf is None:
            name = self.name

            def call(mod, *a):
                return fn(getattr(mod, name), *a)

            jf = jax.jit(functools.partial(self.spec.module.apply, method=call))
            _JITTED[key] = jf
        return _run_warm(jf, key, self.params, *args)

    def _means_scales(self, z_hat, y_shape):
        scales = self._sub(_hp_dec_scale, z_hat)
        means = self._sub(_hp_dec_mean, z_hat)
        # the 3x stride-2 hyper decoder emits 8*ceil(y/8) pixels; crop to y
        scales = scales[:, : y_shape[1], : y_shape[2], :]
        means = means[:, : y_shape[1], : y_shape[2], :]
        return means, scales

    def _sp_predict(self, round_y, q_y_prior, means):
        """Decoder-side super-precision: y = SPnet(round_y, prior) + round_y
        + means (reference models.py:1988-1997). Both encoder and decoder
        run this from DECODED symbols, so the stream stays consistent."""
        pred = self._sub(
            _hp_y_predictor, jnp.concatenate([round_y, q_y_prior], axis=-1)
        )
        return pred + round_y + means

    def compress(self, y, q_y_prior=None):
        """Returns (streams, y_out, new_q_y_prior). When the hyperprior has
        an active SPnet (ELFVC-SP), y_out is the SP-corrected y the decoder
        will reproduce and q_y_prior must carry round(y - means) frames."""
        z = self._sub(_hp_hyper_encoder, y)
        z_stream = self.z_codec.compress(np.asarray(z))
        z_hat = jnp.asarray(self.z_codec.decompress(z_stream, z.shape))
        means, scales = self._means_scales(z_hat, y.shape)
        if self.coder is not None:
            y_stream = self.coder.submit(
                self.y_codec.compress,
                np.asarray(y), np.asarray(scales), np.asarray(means),
            )
        else:
            y_stream = self.y_codec.compress(
                np.asarray(y), np.asarray(scales), np.asarray(means)
            )
        round_y = jnp.round(y - means)
        y_out, new_prior = self._finish(round_y, means, q_y_prior)
        return (
            {"z": z_stream, "y": y_stream, "z_shape": tuple(z.shape)},
            y_out,
            new_prior,
        )

    def decompress(self, streams, y_shape, q_y_prior=None):
        z_hat = jnp.asarray(self.z_codec.decompress(streams["z"], streams["z_shape"]))
        means, scales = self._means_scales(z_hat, y_shape)
        y_hat = jnp.asarray(
            self.y_codec.decompress(streams["y"], np.asarray(scales), np.asarray(means))
        ).reshape(y_shape)
        round_y = y_hat - means
        y_out, new_prior = self._finish(round_y, means, q_y_prior)
        return y_out, new_prior

    def _finish(self, round_y, means, q_y_prior):
        if self.sp:
            if q_y_prior is None:
                q_y_prior = jnp.zeros_like(round_y)
            return self._sp_predict(round_y, q_y_prior, means), round_y
        return round_y + means, round_y


@_exact_warp_semantics
def ssf_compress_gop(spec: CodecSpec, params, gop: jax.Array):
    """ScaleSpaceFlow real-bitstream encode: keyframe + inter chain
    (reference compress path of SSF models). gop: [T, B, H, W, 3].

    Returns (streams, recon [T, B, H, W, 3], total_bits)."""
    from fastvideocodec_tpu.coder import AsyncCoder

    m = spec.module
    gop = _pipe_fold_gop(m, gop)
    coder = AsyncCoder(workers=2)
    img_hp = HyperpriorCoder(spec, params, "img_hyperprior", coder=coder)
    mot_hp = HyperpriorCoder(spec, params, "motion_hyperprior", coder=coder)
    res_hp = HyperpriorCoder(spec, params, "res_hyperprior", coder=coder)

    y0 = _apply(spec, params, _m_img_encoder, gop[0])
    key_streams, y0_hat, _ = img_hp.compress(y0)
    x_ref = _apply(spec, params, _m_img_decoder, y0_hat)

    frames = [x_ref]
    inter_streams = []
    for t in range(1, gop.shape[0]):
        x_cur = gop[t]
        y_mot = _apply(spec, params, _m_motion_encoder, jnp.concatenate([x_cur, x_ref], axis=-1))
        mot_s, y_mot_hat, _ = mot_hp.compress(y_mot)
        x_pred = _apply(spec, params, _m_motion_predict, x_ref, y_mot_hat)
        y_res = _apply(spec, params, _m_res_encoder, x_cur - x_pred)
        res_s, y_res_hat, _ = res_hp.compress(y_res)
        x_ref = x_pred + _apply(spec, params, _m_res_decoder, jnp.concatenate([y_res_hat, y_mot_hat], axis=-1))
        frames.append(x_ref)
        inter_streams.append(
            {"motion": mot_s, "residual": res_s,
             "y_mot_shape": tuple(y_mot.shape), "y_res_shape": tuple(y_res.shape)}
        )
    streams = _resolve_streams(
        {"keyframe": key_streams, "y0_shape": tuple(y0.shape),
         "inter": inter_streams}
    )
    coder.shutdown()
    key_streams = streams["keyframe"]
    inter_streams = streams["inter"]
    bits = 8 * (
        len(key_streams["z"]) + len(key_streams["y"])
        + sum(len(s["motion"]["z"]) + len(s["motion"]["y"])
              + len(s["residual"]["z"]) + len(s["residual"]["y"])
              for s in inter_streams)
    )
    return streams, _pipe_unfold_recon(m, jnp.stack(frames)), bits


@_exact_warp_semantics
def ssf_decompress_gop(spec: CodecSpec, params, streams: dict):
    """Reconstructs the whole GOP from bitstreams only."""
    m = spec.module
    img_hp = HyperpriorCoder(spec, params, "img_hyperprior")
    mot_hp = HyperpriorCoder(spec, params, "motion_hyperprior")
    res_hp = HyperpriorCoder(spec, params, "res_hyperprior")

    y0_hat, _ = img_hp.decompress(streams["keyframe"], streams["y0_shape"])
    x_ref = _apply(spec, params, _m_img_decoder, y0_hat)
    frames = [x_ref]
    for s in streams["inter"]:
        y_mot_hat, _ = mot_hp.decompress(s["motion"], s["y_mot_shape"])
        x_pred = _apply(spec, params, _m_motion_predict, x_ref, y_mot_hat)
        y_res_hat, _ = res_hp.decompress(s["residual"], s["y_res_shape"])
        x_ref = x_pred + _apply(spec, params, _m_res_decoder, jnp.concatenate([y_res_hat, y_mot_hat], axis=-1))
        frames.append(x_ref)
    return _pipe_unfold_recon(m, jnp.stack(frames))


# ---------------------------------------------------------------------------
# ELFVC real bitstreams: flow-predictor delta-motion chain (+SP)
# ---------------------------------------------------------------------------


@_exact_warp_semantics
def elfvc_compress_gop(spec: CodecSpec, params, gop: jax.Array):
    """ELFVC/ELFVC-SP real-bitstream encode (reference models.py:2087-2097):
    the flow predictor runs on DECODED context (x_ref, x_ref_ref, motion
    prior), so the codec transmits only the motion delta; with -SP the
    hyperpriors' SPnets re-predict y from decoded symbols on both sides.

    gop: [T, B, H, W, 3]. Returns (streams, recon, total_bits)."""
    from fastvideocodec_tpu.coder import AsyncCoder

    m = spec.module
    sp1 = m.super_prec and m.sp_stage >= 1
    sp2 = m.super_prec and m.sp_stage >= 2
    coder = AsyncCoder(workers=2)
    gop = _pipe_fold_gop(m, gop)
    img_hp = HyperpriorCoder(spec, params, "img_hyperprior", coder=coder)
    mot_hp = HyperpriorCoder(spec, params, "motion_hyperprior", sp=sp1, coder=coder)
    res_hp = HyperpriorCoder(spec, params, "res_hyperprior", sp=sp2, coder=coder)

    y0 = _apply(spec, params, _m_img_encoder, gop[0])
    key_streams, y0_hat, _ = img_hp.compress(y0)
    x_ref = _apply(spec, params, _m_img_decoder, y0_hat)

    B, H, W = x_ref.shape[0], x_ref.shape[1], x_ref.shape[2]
    state = m.init_state(B, H, W)
    qpm, qpr = None, None  # SP round-y priors (zeros on first P-frame)

    frames = [x_ref]
    inter_streams = []
    for t in range(1, gop.shape[0]):
        x_cur = gop[t]
        motion_info_local = _apply(spec, params, _m_flow_predictor, jnp.concatenate(
                [x_ref, state.x_ref_ref, state.motion_info_prior], axis=-1
            ))
        x_pred_local = _apply(spec, params, _m_forward_prediction, x_ref, motion_info_local)
        y_motion = _apply(spec, params, _m_motion_encoder, jnp.concatenate([x_cur, x_pred_local], axis=-1))
        mot_s, y_mot_out, qpm = mot_hp.compress(y_motion, q_y_prior=qpm)
        motion_delta = _apply(spec, params, _m_motion_decoder, y_mot_out)
        motion_info = state.motion_info_prior + motion_delta
        x_pred = _apply(spec, params, _m_forward_prediction, x_ref, motion_info)
        y_res = _apply(spec, params, _m_res_encoder, x_cur - x_pred)
        res_s, y_res_out, qpr = res_hp.compress(y_res, q_y_prior=qpr)
        x_rec = x_pred + _apply(spec, params, _m_res_decoder, jnp.concatenate([y_res_out, y_mot_out], axis=-1))
        state = state._replace(x_ref_ref=x_ref, motion_info_prior=motion_info)
        x_ref = x_rec
        frames.append(x_ref)
        inter_streams.append(
            {"motion": mot_s, "residual": res_s,
             "y_mot_shape": tuple(y_motion.shape),
             "y_res_shape": tuple(y_res.shape)}
        )
    streams = _resolve_streams(
        {"keyframe": key_streams, "y0_shape": tuple(y0.shape),
         "inter": inter_streams}
    )
    coder.shutdown()
    key_streams = streams["keyframe"]
    inter_streams = streams["inter"]
    bits = 8 * (
        len(key_streams["z"]) + len(key_streams["y"])
        + sum(len(s["motion"]["z"]) + len(s["motion"]["y"])
              + len(s["residual"]["z"]) + len(s["residual"]["y"])
              for s in inter_streams)
    )
    return streams, _pipe_unfold_recon(m, jnp.stack(frames)), bits


@_exact_warp_semantics
def elfvc_decompress_gop(spec: CodecSpec, params, streams: dict):
    """Reconstructs the whole GOP from bitstreams only (the flow-predictor
    context and SP priors are all derived from decoded data)."""
    m = spec.module
    sp1 = m.super_prec and m.sp_stage >= 1
    sp2 = m.super_prec and m.sp_stage >= 2
    img_hp = HyperpriorCoder(spec, params, "img_hyperprior")
    mot_hp = HyperpriorCoder(spec, params, "motion_hyperprior", sp=sp1)
    res_hp = HyperpriorCoder(spec, params, "res_hyperprior", sp=sp2)

    y0_hat, _ = img_hp.decompress(streams["keyframe"], streams["y0_shape"])
    x_ref = _apply(spec, params, _m_img_decoder, y0_hat)
    B, H, W = x_ref.shape[0], x_ref.shape[1], x_ref.shape[2]
    state = m.init_state(B, H, W)
    qpm, qpr = None, None

    frames = [x_ref]
    for s in streams["inter"]:
        # the flow predictor only conditions the ENCODER's motion analysis;
        # the decoder needs just prior + transmitted delta (models.py:2095)
        y_mot_out, qpm = mot_hp.decompress(s["motion"], s["y_mot_shape"], q_y_prior=qpm)
        motion_delta = _apply(spec, params, _m_motion_decoder, y_mot_out)
        motion_info = state.motion_info_prior + motion_delta
        x_pred = _apply(spec, params, _m_forward_prediction, x_ref, motion_info)
        y_res_out, qpr = res_hp.decompress(s["residual"], s["y_res_shape"], q_y_prior=qpr)
        x_rec = x_pred + _apply(spec, params, _m_res_decoder, jnp.concatenate([y_res_out, y_mot_out], axis=-1))
        state = state._replace(x_ref_ref=x_ref, motion_info_prior=motion_info)
        x_ref = x_rec
        frames.append(x_ref)
    return _pipe_unfold_recon(m, jnp.stack(frames))


# ---------------------------------------------------------------------------
# MCVC real bitstreams: masked-view joint coding + backup-decoder enhance
# ---------------------------------------------------------------------------


@_exact_warp_semantics
def mcvc_compress_gop(spec: CodecSpec, params, gop: jax.Array, mask):
    """MCVC(-IA) real-bitstream encode (reference models.py:2354-2400):
    failed views are zero-masked before analysis, the joint latents are
    coded once for all views (views folded into batch), and for -IA the
    backup cross-view-attention decoders reconstruct lost views from the
    surviving views' MASKED latents.

    gop: [T, B*V, H, W, 3]; mask: [B*V] of {0,1} (transmitted metadata —
    the receiver knows which views failed). Returns
    (streams, enhanced recon [T, ...], total_bits)."""
    from fastvideocodec_tpu.models.mcvc import mask_views

    from fastvideocodec_tpu.coder import AsyncCoder

    m = spec.module
    ia = m.imbalanced_correlation
    coder = AsyncCoder(workers=2)
    img_hp = HyperpriorCoder(spec, params, "img_hyperprior", coder=coder)
    mot_hp = HyperpriorCoder(spec, params, "motion_hyperprior", coder=coder)
    res_hp = HyperpriorCoder(spec, params, "res_hyperprior", coder=coder)
    mask = jnp.asarray(mask)

    x0 = mask_views(gop[0], mask)
    y0 = _apply(spec, params, _m_img_encoder, x0)
    key_streams, y0_hat, _ = img_hp.compress(y0)
    x_ref = _apply(spec, params, _m_img_decoder, y0_hat)
    if ia:
        x_enh = _apply(spec, params, _m_backup_img_decoder, mask_views(y0_hat, mask))
    else:
        x_enh = x_ref

    recons = [x_enh]
    inter_streams = []
    for t in range(1, gop.shape[0]):
        x_cur = mask_views(gop[t], mask)
        x_ref_m = mask_views(x_ref, mask)
        y_motion = _apply(spec, params, _m_motion_encoder, jnp.concatenate([x_cur, x_ref_m], axis=-1))
        mot_s, y_mot_hat, _ = mot_hp.compress(y_motion)
        x_pred = _apply(spec, params, _m_motion_predict, x_ref_m, y_mot_hat)
        y_res = _apply(spec, params, _m_res_encoder, x_cur - x_pred)
        res_s, y_res_hat, _ = res_hp.compress(y_res)
        x_rec = x_pred + _apply(spec, params, _m_res_decoder, jnp.concatenate([y_res_hat, y_mot_hat], axis=-1))
        if ia:
            ym = mask_views(y_mot_hat, mask)
            yr = mask_views(y_res_hat, mask)
            x_enh = x_pred + _apply(spec, params, _m_backup_res_decoder, jnp.concatenate([yr, ym], axis=-1))
        else:
            x_enh = x_rec
        recons.append(x_enh)
        x_ref = x_rec
        inter_streams.append(
            {"motion": mot_s, "residual": res_s,
             "y_mot_shape": tuple(y_motion.shape),
             "y_res_shape": tuple(y_res.shape)}
        )
    streams = _resolve_streams(
        {"keyframe": key_streams, "y0_shape": tuple(y0.shape),
         "inter": inter_streams, "mask": np.asarray(mask).tolist()}
    )
    coder.shutdown()
    key_streams = streams["keyframe"]
    inter_streams = streams["inter"]
    bits = 8 * (
        len(key_streams["z"]) + len(key_streams["y"])
        + sum(len(s["motion"]["z"]) + len(s["motion"]["y"])
              + len(s["residual"]["z"]) + len(s["residual"]["y"])
              for s in inter_streams)
    )
    return streams, jnp.stack(recons), bits


@_exact_warp_semantics
def mcvc_decompress_gop(spec: CodecSpec, params, streams: dict):
    """Reconstructs the enhanced (backup-decoded for -IA) GOP from
    bitstreams + the transmitted view mask only."""
    from fastvideocodec_tpu.models.mcvc import mask_views

    m = spec.module
    ia = m.imbalanced_correlation
    img_hp = HyperpriorCoder(spec, params, "img_hyperprior")
    mot_hp = HyperpriorCoder(spec, params, "motion_hyperprior")
    res_hp = HyperpriorCoder(spec, params, "res_hyperprior")
    mask = jnp.asarray(streams["mask"], jnp.float32)

    y0_hat, _ = img_hp.decompress(streams["keyframe"], streams["y0_shape"])
    x_ref = _apply(spec, params, _m_img_decoder, y0_hat)
    if ia:
        x_enh = _apply(spec, params, _m_backup_img_decoder, mask_views(y0_hat, mask))
    else:
        x_enh = x_ref

    recons = [x_enh]
    for s in streams["inter"]:
        x_ref_m = mask_views(x_ref, mask)
        y_mot_hat, _ = mot_hp.decompress(s["motion"], s["y_mot_shape"])
        x_pred = _apply(spec, params, _m_motion_predict, x_ref_m, y_mot_hat)
        y_res_hat, _ = res_hp.decompress(s["residual"], s["y_res_shape"])
        x_rec = x_pred + _apply(spec, params, _m_res_decoder, jnp.concatenate([y_res_hat, y_mot_hat], axis=-1))
        if ia:
            ym = mask_views(y_mot_hat, mask)
            yr = mask_views(y_res_hat, mask)
            x_enh = x_pred + _apply(spec, params, _m_backup_res_decoder, jnp.concatenate([yr, ym], axis=-1))
        else:
            x_enh = x_rec
        recons.append(x_enh)
        x_ref = x_rec
    return jnp.stack(recons)


# ---------------------------------------------------------------------------
# RLVC real bitstreams (recurrent: factorized first P-frame, RPM after)
# ---------------------------------------------------------------------------


def _rlvc_codec_real(spec, params, codec_name, dec4_name, x, rae_hidden,
                     rpm_hidden, rpm_flag, prior_latent, fcodec, gcodec):
    """One Coder2D pass with real entropy coding (reference
    compress_slow/decompress_slow fused, entropy_models.py:97-148)."""
    enc = _coder2d_fn(spec, codec_name, dec4_name, "enc")
    dec = _coder2d_fn(spec, codec_name, dec4_name, "dec")
    rpm_net = _coder2d_fn(spec, codec_name, dec4_name, "rpm")

    state_enc, state_dec = jnp.split(rae_hidden, 2, axis=-1)
    latent, state_enc = _apply(spec, params, enc, x, state_enc)
    if rpm_flag:
        sigma_raw, mu, rpm_hidden = _apply(
            spec, params, rpm_net, prior_latent, rpm_hidden
        )
        sigma = jnp.exp(jnp.maximum(sigma_raw, -7.0)) / 10.0
        stream = gcodec.compress(np.asarray(latent), np.asarray(sigma), np.asarray(mu))
        latent_hat = jnp.round(latent - mu) + mu
    else:
        stream = fcodec.compress(np.asarray(latent))
        latent_hat = jnp.asarray(fcodec.decompress(stream, latent.shape))
    # prior from the DECODED latent so encoder and decoder states agree
    # (reference compress_slow, entropy_models.py:122)
    prior_latent = jnp.round(latent_hat)
    hat, state_dec = _apply(spec, params, dec, latent_hat, state_dec)
    rae_hidden = jnp.concatenate([state_enc, state_dec], axis=-1)
    return hat, rae_hidden, rpm_hidden, prior_latent, stream, latent_hat.shape


def _rlvc_codec_real_ms(spec, params, codec_name, dec4_name, x, rae_hidden,
                        fz_codec, gcodec):
    """One Coder2D pass with MeanScaleHyperPriors real coding (RLVC-HP;
    reference entropy_models.py:250-324): z via the factorized bottleneck
    tables, the latent via the scale-table Gaussian coder with decoded
    (sigma, mu). entropy_trick semantics (:278-290): the reference permutes
    [B,C,H,W] -> [1,C,B,H,W] so one rANS call codes the whole batch — the
    host range coder here consumes the full tensor in ONE call natively."""
    enc = _coder2d_fn(spec, codec_name, dec4_name, "enc")
    dec = _coder2d_fn(spec, codec_name, dec4_name, "dec")
    hp_enc = _coder2d_fn(spec, codec_name, dec4_name, "hp_enc")
    hp_dec = _coder2d_fn(spec, codec_name, dec4_name, "hp_dec")

    state_enc, state_dec = jnp.split(rae_hidden, 2, axis=-1)
    latent, state_enc = _apply(spec, params, enc, x, state_enc)
    z = _apply(spec, params, hp_enc, latent)
    z_stream = fz_codec.compress(np.asarray(z))
    z_hat = jnp.asarray(fz_codec.decompress(z_stream, z.shape))
    sigma, mu = _apply(spec, params, hp_dec, z_hat)
    y_stream = gcodec.compress(np.asarray(latent), np.asarray(sigma), np.asarray(mu))
    latent_hat = jnp.round(latent - mu) + mu
    hat, state_dec = _apply(spec, params, dec, latent_hat, state_dec)
    rae_hidden = jnp.concatenate([state_enc, state_dec], axis=-1)
    stream = {"z": z_stream, "y": y_stream, "z_shape": tuple(z.shape)}
    return hat, rae_hidden, stream, latent_hat.shape


def _rlvc_codec_real_ms_decode(spec, params, codec_name, dec4_name,
                               rae_dec_state, latent_shape, stream,
                               fz_codec, gcodec):
    dec = _coder2d_fn(spec, codec_name, dec4_name, "dec")
    hp_dec = _coder2d_fn(spec, codec_name, dec4_name, "hp_dec")

    z_hat = jnp.asarray(fz_codec.decompress(stream["z"], stream["z_shape"]))
    sigma, mu = _apply(spec, params, hp_dec, z_hat)
    latent_hat = jnp.asarray(
        gcodec.decompress(stream["y"], np.asarray(sigma), np.asarray(mu))
    ).reshape(latent_shape)
    hat, rae_dec_state = _apply(spec, params, dec, latent_hat, rae_dec_state)
    return hat, rae_dec_state


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

    mshyper = m.entropy_type == "mshyper"
    latent_shapes = {}
    for t in range(1, T):
        x_cur = gop[t][None]
        flag = t > 1
        mv = _apply(spec, params, _m_optic_flow, x_cur, x_ref)
        if mshyper:
            mv_hat, rae_mv, mv_stream, mv_shape = _rlvc_codec_real_ms(
                spec, params, "mv_codec", "mv_dec4", mv, rae_mv, fmv, gc,
            )
        else:
            mv_hat, rae_mv, rpm_mv, mv_prior, mv_stream, mv_shape = _rlvc_codec_real(
                spec, params, "mv_codec", "mv_dec4", mv, rae_mv, rpm_mv, flag,
                mv_prior, fmv, gc,
            )
        x_warp = flow_warp(x_ref, mv_hat)
        x_mc = _apply(spec, params, _m_warpnet, jnp.concatenate([x_warp, x_ref], axis=-1)) + x_warp
        res = x_cur - x_mc
        if mshyper:
            res_hat, rae_res, res_stream, res_shape = _rlvc_codec_real_ms(
                spec, params, "res_codec", "res_dec4", res, rae_res, fres, gc,
            )
        else:
            res_hat, rae_res, rpm_res, res_prior, res_stream, res_shape = _rlvc_codec_real(
                spec, params, "res_codec", "res_dec4", res, rae_res, rpm_res, flag,
                res_prior, fres, gc,
            )
        x_ref = jnp.clip(res_hat + x_mc, 0.0, 1.0)
        recon.append(x_ref[0])
        streams.append({"mv": mv_stream, "res": res_stream})
        latent_shapes = {"mv": tuple(mv_shape), "res": tuple(res_shape)}
    bits = 8 * sum(_stream_len(s["mv"]) + _stream_len(s["res"]) for s in streams)
    return streams, jnp.stack(recon), bits, latent_shapes


def _stream_len(s) -> int:
    """Byte length of one latent's stream(s): bytes for the rpm/rpm2 path,
    {z, y} dict for the mshyper hyperprior path."""
    if isinstance(s, dict):
        return len(s["z"]) + len(s["y"])
    return len(s)


def _rlvc_codec_real_decode(spec, params, codec_name, dec4_name, rae_dec_state,
                            rpm_hidden, rpm_flag, prior_latent, latent_shape,
                            stream, fcodec, gcodec):
    dec = _coder2d_fn(spec, codec_name, dec4_name, "dec")
    rpm_net = _coder2d_fn(spec, codec_name, dec4_name, "rpm")

    if rpm_flag:
        sigma_raw, mu, rpm_hidden = _apply(
            spec, params, rpm_net, prior_latent, rpm_hidden
        )
        sigma = jnp.exp(jnp.maximum(sigma_raw, -7.0)) / 10.0
        latent_hat = jnp.asarray(
            gcodec.decompress(stream, np.asarray(sigma), np.asarray(mu))
        ).reshape(latent_shape)
    else:
        latent_hat = jnp.asarray(fcodec.decompress(stream, latent_shape))
    prior_latent = jnp.round(latent_hat)
    hat, rae_dec_state = _apply(spec, params, dec, latent_hat, rae_dec_state)
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
    mshyper = m.entropy_type == "mshyper"
    for t, s in enumerate(streams, start=1):
        flag = t > 1
        if mshyper:
            mv_hat, rae_mv_dec = _rlvc_codec_real_ms_decode(
                spec, params, "mv_codec", "mv_dec4", rae_mv_dec,
                latent_shapes["mv"], s["mv"], fmv, gc,
            )
        else:
            mv_hat, rae_mv_dec, rpm_mv, mv_prior = _rlvc_codec_real_decode(
                spec, params, "mv_codec", "mv_dec4", rae_mv_dec, rpm_mv, flag,
                mv_prior, latent_shapes["mv"], s["mv"], fmv, gc,
            )
        x_warp = flow_warp(x_ref, mv_hat)
        x_mc = _apply(spec, params, _m_warpnet, jnp.concatenate([x_warp, x_ref], axis=-1)) + x_warp
        if mshyper:
            res_hat, rae_res_dec = _rlvc_codec_real_ms_decode(
                spec, params, "res_codec", "res_dec4", rae_res_dec,
                latent_shapes["res"], s["res"], fres, gc,
            )
        else:
            res_hat, rae_res_dec, rpm_res, res_prior = _rlvc_codec_real_decode(
                spec, params, "res_codec", "res_dec4", rae_res_dec, rpm_res, flag,
                res_prior, latent_shapes["res"], s["res"], fres, gc,
            )
        x_ref = jnp.clip(res_hat + x_mc, 0.0, 1.0)
        recon.append(x_ref[0])
    return jnp.stack(recon)


# ---------------------------------------------------------------------------
# DVC real bitstreams (reference DVC/net.py:121-205 torchac path: BitEstimator
# streams for mv/z, Laplace(sigma) stream for the residual features)
# ---------------------------------------------------------------------------


@_exact_warp_semantics
def dvc_compress_gop(spec: CodecSpec, params, gop: jax.Array):
    """DVC real-bitstream encode over a GOP [T, H, W, 3] (frame 0 I-coded).

    Sequential P-frame chain (each frame references the previous recon);
    per frame three streams: mv (BitEstimator), z (BitEstimator), features
    (Laplace with sigma = prior_decoder(z_q)). Host coding overlaps the
    device chain via AsyncCoder — recon depends on quantized latents only.
    Returns (streams, recon [T-1, H, W, 3], bits)."""
    from fastvideocodec_tpu.coder import AsyncCoder
    from fastvideocodec_tpu.ops import flow_warp

    mv_codec, z_codec, feat_codec = _codecs_from_params(params)
    coder = AsyncCoder(workers=2)

    T = gop.shape[0]
    x_ref = gop[0][None]
    recon, futures, shapes = [], [], []
    for t in range(1, T):
        x_cur = gop[t][None]
        mv_latent = _apply(spec, params, _m_mv_encode_flow, x_cur, x_ref)
        mv_q = jnp.round(mv_latent)
        mv_f = coder.submit(mv_codec.compress, np.asarray(mv_q))
        mv_hat = _apply(spec, params, _m_mv_decoder, mv_q)

        x_warp = flow_warp(x_ref, mv_hat)
        x_mc = _apply(
            spec, params, _m_warpnet, jnp.concatenate([x_warp, x_ref], axis=-1)
        ) + x_warp
        res = x_cur - x_mc
        feature = _apply(spec, params, _m_res_encoder, res)
        z = _apply(spec, params, _m_prior_encoder, feature)
        z_q = jnp.round(z)
        z_f = coder.submit(z_codec.compress, np.asarray(z_q))
        sigma = _apply(spec, params, _m_prior_decoder, z_q)
        feat_q = jnp.round(feature)
        feat_f = coder.submit(
            feat_codec.compress, np.asarray(feat_q), np.asarray(sigma)
        )
        res_hat = _apply(spec, params, _m_res_decoder, feat_q)
        x_ref = jnp.clip(x_mc + res_hat, 0.0, 1.0)
        recon.append(x_ref[0])
        futures.append((mv_f, z_f, feat_f))
        shapes.append({
            "mv": tuple(mv_q.shape), "z": tuple(z_q.shape),
            "feat": tuple(feat_q.shape),
        })

    frames = [
        {"mv": fm.result(), "z": fz.result(), "feat": ff.result()}
        for fm, fz, ff in futures
    ]
    coder.shutdown()
    streams = {"frames": frames, "shapes": shapes}
    bits = 8 * sum(len(f["mv"]) + len(f["z"]) + len(f["feat"]) for f in frames)
    return streams, jnp.stack(recon), bits


@_exact_warp_semantics
def dvc_decompress_gop(spec: CodecSpec, params, iframe: jax.Array, streams):
    """DVC real-bitstream decode from (I-frame, bitstreams) only."""
    from fastvideocodec_tpu.ops import flow_warp

    mv_codec, z_codec, feat_codec = _codecs_from_params(params)
    x_ref = iframe[None]
    recon = []
    for f, sh in zip(streams["frames"], streams["shapes"]):
        mv_q = jnp.asarray(mv_codec.decompress(f["mv"], sh["mv"]))
        mv_hat = _apply(spec, params, _m_mv_decoder, mv_q)
        x_warp = flow_warp(x_ref, mv_hat)
        x_mc = _apply(
            spec, params, _m_warpnet, jnp.concatenate([x_warp, x_ref], axis=-1)
        ) + x_warp
        z_q = jnp.asarray(z_codec.decompress(f["z"], sh["z"]))
        sigma = _apply(spec, params, _m_prior_decoder, z_q)
        feat_q = jnp.asarray(
            feat_codec.decompress(f["feat"], np.asarray(sigma)).reshape(sh["feat"])
        )
        res_hat = _apply(spec, params, _m_res_decoder, feat_q)
        x_ref = jnp.clip(x_mc + res_hat, 0.0, 1.0)
        recon.append(x_ref[0])
    return jnp.stack(recon)


# ---------------------------------------------------------------------------
# Base / Base-EC / Base-ER real bitstreams (reference models.py:1722-1806
# torchac path). At eval the ER correction is a deterministic function of the
# ROUNDED latent (corr = latent + (gen(round)+round - latent) = gen(q) + q),
# so both sides recompute it from decoded symbols alone; EC's feature
# correction comes from the hyper-decoder's second half, also symbol-derived.
# ---------------------------------------------------------------------------


def _m_mv_gen(m, q):
    return m.mv_gen(q) + q


def _m_z_gen(m, q):
    return m.z_gen(q) + q


def _m_res_gen(m, q):
    return m.res_gen(q) + q


def _base_mc(spec, params, m, x_ref, mv_q):
    """Decode-side motion compensation from the coded mv symbols. Both
    sides run this identical path, so decode==encode holds by
    construction."""
    from fastvideocodec_tpu.ops import flow_warp

    mv_dec_in = _apply(spec, params, _m_mv_gen, mv_q) if m.use_er else mv_q
    mv_hat = _apply(spec, params, _m_mv_decoder, mv_dec_in)
    x_warp = flow_warp(x_ref, mv_hat)
    return _apply(
        spec, params, _m_warpnet, jnp.concatenate([x_warp, x_ref], axis=-1)
    ) + x_warp


def _base_sigma(spec, params, m, z_q):
    """Decode-side (sigma, EC feature correction) from the coded z symbols."""
    z_dec_in = _apply(spec, params, _m_z_gen, z_q) if m.use_er else z_q
    sigma_out = _apply(spec, params, _m_prior_decoder, z_dec_in)
    if m.use_ec:
        sigma, correction = jnp.split(sigma_out, 2, axis=-1)
        return sigma, jax.nn.sigmoid(correction) - 0.5
    return sigma_out, None


def _base_reconstruct(spec, params, m, x_mc, feat_q, correction):
    res_dec_in = _apply(spec, params, _m_res_gen, feat_q) if m.use_er else feat_q
    if m.use_ec:
        res_dec_in = jnp.concatenate([res_dec_in, correction], axis=-1)
    res_hat = _apply(spec, params, _m_res_decoder, res_dec_in)
    return jnp.clip(x_mc + res_hat, 0.0, 1.0)


@_exact_warp_semantics
def base_compress_gop(spec: CodecSpec, params, gop: jax.Array):
    """Base-family real-bitstream encode over a GOP [T, H, W, 3].

    Returns (streams, recon [T-1, H, W, 3], bits). Per frame: mv and z
    BitEstimator streams, features Laplace(sigma) — where sigma must be the
    DECODE-side sigma (ER/EC corrections applied), so the encoder derives
    it through the exact decode path."""
    from fastvideocodec_tpu.coder import AsyncCoder

    m = spec.module
    mv_codec, z_codec, feat_codec = _codecs_from_params(params)
    coder = AsyncCoder(workers=2)

    T = gop.shape[0]
    x_ref = gop[0][None]
    recon, futures, shapes = [], [], []
    for t in range(1, T):
        x_cur = gop[t][None]
        mv_q = jnp.round(_apply(spec, params, _m_mv_encode_flow, x_cur, x_ref))
        mv_f = coder.submit(mv_codec.compress, np.asarray(mv_q))
        # the residual target is against the DECODE-side MC
        x_mc = _base_mc(spec, params, m, x_ref, mv_q)
        res = x_cur - x_mc
        feature = _apply(spec, params, _m_res_encoder, res)
        z_q = jnp.round(_apply(spec, params, _m_prior_encoder, feature))
        z_f = coder.submit(z_codec.compress, np.asarray(z_q))
        feat_q = jnp.round(feature)
        sigma, correction = _base_sigma(spec, params, m, z_q)
        feat_f = coder.submit(
            feat_codec.compress, np.asarray(feat_q), np.asarray(sigma)
        )
        x_ref = _base_reconstruct(spec, params, m, x_mc, feat_q, correction)
        recon.append(x_ref[0])
        futures.append((mv_f, z_f, feat_f))
        shapes.append({
            "mv": tuple(mv_q.shape), "z": tuple(z_q.shape),
            "feat": tuple(feat_q.shape),
        })

    frames = [
        {"mv": fm.result(), "z": fz.result(), "feat": ff.result()}
        for fm, fz, ff in futures
    ]
    coder.shutdown()
    streams = {"frames": frames, "shapes": shapes}
    bits = 8 * sum(len(f["mv"]) + len(f["z"]) + len(f["feat"]) for f in frames)
    return streams, jnp.stack(recon), bits


@_exact_warp_semantics
def base_decompress_gop(spec: CodecSpec, params, iframe: jax.Array, streams):
    """Base-family real-bitstream decode from (I-frame, bitstreams) only."""
    m = spec.module
    mv_codec, z_codec, feat_codec = _codecs_from_params(params)
    x_ref = iframe[None]
    recon = []
    for f, sh in zip(streams["frames"], streams["shapes"]):
        mv_q = jnp.asarray(mv_codec.decompress(f["mv"], sh["mv"]))
        z_q = jnp.asarray(z_codec.decompress(f["z"], sh["z"]))
        x_mc = _base_mc(spec, params, m, x_ref, mv_q)
        sigma, correction = _base_sigma(spec, params, m, z_q)
        feat_q = jnp.asarray(
            feat_codec.decompress(f["feat"], np.asarray(sigma)).reshape(sh["feat"])
        )
        x_ref = _base_reconstruct(spec, params, m, x_mc, feat_q, correction)
        recon.append(x_ref[0])
    return jnp.stack(recon)
