"""GOP-based evaluation harness (reference eval.py:254-354
static_simulation_model): iterate a VideoDataset, group frames into GOPs,
I-code frame 0 (BPG when available, else the codec's own keyframe branch or
lossless-passthrough accounting), run the jitted GOP rollout, aggregate
per-level bpp + per-frame PSNR, and append the 2-line log format the plot /
ABR tooling parses."""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from fastvideocodec_tpu.anchors import bpg_compress_iframe, have_bpg
from fastvideocodec_tpu.gop import rollout
from fastvideocodec_tpu.models.registry import CodecSpec
from fastvideocodec_tpu.utils.logs import write_eval_log
from fastvideocodec_tpu.utils.meters import AverageMeter


def pad_to_multiple(x: np.ndarray, mult: int = 64):
    """Pad H, W up to a multiple (XLA static shapes; metrics are computed on
    the unpadded region by the caller)."""
    h, w = x.shape[-3:-1]
    ph = (-h) % mult
    pw = (-w) % mult
    if ph or pw:
        pad = [(0, 0)] * (x.ndim - 3) + [(0, ph), (0, pw), (0, 0)]
        x = np.pad(x, pad, mode="edge")
    return x, (h, w)


_DEC_GRAPHS: dict = {}


def _time_decode_only(spec: CodecSpec, params, padded: np.ndarray):
    """Estimated-bits mode decode timing: run the family's decode-only
    device graph (what a receiver executes after host entropy decode) so
    the 2-line log's enc_t/dec_t split is honest without real bitstreams
    (reference eval.py:316-337 fills genuinely distinct meters).

    Returns wall seconds for one GOP decode, or None when the family has
    no standalone decode-graph builder yet (callers fall back to the
    rollout time, which over-counts decode by the analysis half)."""
    if spec.family != "lsvc":
        return None
    from fastvideocodec_tpu.gop.decode_graph import build_lsvc_decode
    from fastvideocodec_tpu.ops import space_to_depth

    T, H, W = padded.shape[0], padded.shape[-3], padded.shape[-2]
    key = (spec.module, T, H, W)
    entry = _DEC_GRAPHS.get(key)
    if entry is None:
        decode, latents = build_lsvc_decode(spec.module, T, H, W)
        entry = (jax.jit(decode), latents, [False])
        # keep only the live entry: the cache holds jitted closures plus
        # full example-latent arrays, so a long eval sweeping many
        # resolutions/GOP tails would otherwise grow without bound
        # (ADVICE r4). One entry preserves the per-(video,shape) reuse
        # that matters; a shape change just pays one recompile.
        _DEC_GRAPHS.clear()
        _DEC_GRAPHS[key] = entry
    dfn, latents, warmed = entry
    s2d = spec.module.s2d
    iframe = jnp.asarray(padded[0:1])
    iframe_s2d = space_to_depth(iframe, s2d)[0] if s2d > 1 else iframe[0]
    if not warmed[0]:  # compile outside the timed region
        out = dfn(params, iframe_s2d, *latents)
        _ = (float(out[0]), float(out[1]))
        warmed[0] = True
    t0 = time.perf_counter()
    out = dfn(params, iframe_s2d, *latents)
    _ = (float(out[0]), float(out[1]))  # host sync
    return time.perf_counter() - t0


def code_iframe(frame: np.ndarray, i_level: int):
    """BPG I-frame when the binary exists (models.py:412-429); otherwise a
    null I-codec that passes the frame through and charges 24 bpp (honest
    upper bound, clearly flagged in the log aux fields)."""
    if have_bpg():
        return bpg_compress_iframe(frame, i_level)
    mse = 1e-12
    return frame.copy(), 24.0, 10 * np.log10(1.0 / mse)


def _real_bits_gop(spec: CodecSpec, params, gop: jnp.ndarray, mask=None):
    """Dispatch one GOP through the family's real-bitstream encode AND
    decode (reference compress_slow/decompress_slow net-vs-AC accounting,
    entropy_models.py:97-148). Returns
    (p_recon [T-1, H, W, 3], key_recon or None, bits_act,
     enc_t, dec_t, enc_ac_t, dec_ac_t).

    For family 'mcvc' the gop is [T, B*V, H, W, 3] and `mask` carries the
    alive-view mask; the return's p_recon is [T-1, B*V, H, W, 3] and
    key_recon is [B*V, H, W, 3] (the jointly coded keyframe)."""
    from fastvideocodec_tpu.coder import measure_ac_time
    from fastvideocodec_tpu.coder import video as cv
    from fastvideocodec_tpu.utils.meters import StageTimers

    T = gop.shape[0]
    fam = spec.family
    timers = StageTimers()
    stage_name = {"enc": "E-NET", "dec": "D-NET"}
    next_stage = ["enc"]

    def timed(fn):
        name = stage_name[next_stage[0]]
        next_stage[0] = "dec"
        with measure_ac_time() as acc:
            with timers.stage(name):
                out = fn()
                jax.block_until_ready(out[0] if isinstance(out, tuple) else out)
        dt = timers.meters[name].val
        return out, dt, acc["seconds"]

    if fam == "lsvc":
        (streams, recon, bits), enc_t, enc_ac = timed(
            lambda: cv.lsvc_compress(spec, params, gop)
        )
        dec, dec_t, dec_ac = timed(
            lambda: cv.lsvc_decompress(spec, params, gop[0], streams, T - 1)
        )
        return np.asarray(dec), None, bits, enc_t, dec_t, enc_ac, dec_ac
    if fam == "rlvc":
        (streams, recon, bits, shapes), enc_t, enc_ac = timed(
            lambda: cv.rlvc_compress_gop(spec, params, gop)
        )
        dec, dec_t, dec_ac = timed(
            lambda: cv.rlvc_decompress_gop(spec, params, gop[0], streams, shapes)
        )
        return np.asarray(dec)[:, 0], None, bits, enc_t, dec_t, enc_ac, dec_ac
    if fam in ("dvc", "base"):
        compress = cv.dvc_compress_gop if fam == "dvc" else cv.base_compress_gop
        decompress = (
            cv.dvc_decompress_gop if fam == "dvc" else cv.base_decompress_gop
        )
        (streams, recon, bits), enc_t, enc_ac = timed(
            lambda: compress(spec, params, gop)
        )
        dec, dec_t, dec_ac = timed(
            lambda: decompress(spec, params, gop[0], streams)
        )
        return np.asarray(dec), None, bits, enc_t, dec_t, enc_ac, dec_ac
    if fam in ("ssf", "elfvc"):
        g5 = gop[:, None]
        compress = (
            cv.elfvc_compress_gop if fam == "elfvc" else cv.ssf_compress_gop
        )
        decompress = (
            cv.elfvc_decompress_gop if fam == "elfvc" else cv.ssf_decompress_gop
        )
        (streams, recon, bits), enc_t, enc_ac = timed(
            lambda: compress(spec, params, g5)
        )
        dec, dec_t, dec_ac = timed(lambda: decompress(spec, params, streams))
        dec = np.asarray(dec)[:, 0]
        return dec[1:], dec[0], bits, enc_t, dec_t, enc_ac, dec_ac
    if fam == "mcvc":
        if mask is None:
            mask = jnp.ones((gop.shape[1],), gop.dtype)
        (streams, recon, bits), enc_t, enc_ac = timed(
            lambda: cv.mcvc_compress_gop(spec, params, gop, mask)
        )
        dec, dec_t, dec_ac = timed(
            lambda: cv.mcvc_decompress_gop(spec, params, streams)
        )
        dec = np.asarray(dec)
        return dec[1:], dec[0], bits, enc_t, dec_t, enc_ac, dec_ac
    raise ValueError(f"no real-bitstream path for family '{fam}'")


def evaluate_video(
    spec: CodecSpec,
    params,
    dataset,
    gop_size: int = 16,
    log_path: str | None = None,
    level: int = 0,
    compress_iframe: bool = True,
    max_gops: int = 0,
    real_bits: bool = False,
):
    """Runs the whole dataset; returns dict of aggregates. Appends one
    2-line record per video to log_path when eof is reached.

    real_bits=True drives the family's actual bitstream encode AND decode:
    bpp becomes bpp_act (coded bytes), enc_t/dec_t are genuinely separate,
    and the log's aux fields carry the net-vs-AC split
    (aux = enc_ac_t, dec_ac_t, bpp_est, msssim_db) — reference
    eval.py:332-337.

    MS-SSIM is computed per frame next to PSNR whenever the clip is big
    enough for 5-scale MS-SSIM (reference eval.py:199-220 logs both; the
    msssim 'quality' is -10*log10(1-msssim), models.py:475-487). When
    spec.loss_type == 'M' the per-frame quality list written to the log is
    the MS-SSIM quality (what the reference's msssim-mode plots parse);
    otherwise it is PSNR and the mean MS-SSIM rides the aux fields."""
    from fastvideocodec_tpu.ops.msssim import msssim_db

    jit_rollout = jax.jit(
        partial(rollout, spec, training=False, rng=None)
    )
    jit_msssim = jax.jit(msssim_db)
    bpp_meter = AverageMeter()
    bpp_est_meter = AverageMeter()
    psnr_meter = AverageMeter()
    msssim_meter = AverageMeter()
    enc_meter = AverageMeter()
    dec_meter = AverageMeter()
    enc_ac_meter = AverageMeter()
    dec_ac_meter = AverageMeter()
    all_psnr: list[float] = []
    all_msssim: list[float] = []
    buf: list[np.ndarray] = []
    gops_done = 0
    # SSF-family streams self-code the keyframe (neural I-branch); BPG
    # would double-code frame 0
    if real_bits and spec.family in ("ssf", "elfvc"):
        compress_iframe = False

    n = len(dataset)
    for idx in range(n):
        frame, eof = dataset[idx]
        buf.append(frame)
        if len(buf) < gop_size and not eof:
            continue
        gop = np.stack(buf)
        buf = []
        T = gop.shape[0]
        if T < 2:
            continue
        # I-frame
        # 5-scale MS-SSIM needs min(H, W) > 160 (same constraint as
        # pytorch_msssim); smaller eval clips log PSNR only
        do_msssim = min(gop.shape[-3], gop.shape[-2]) > 160

        def quality(x_hat_f: np.ndarray, raw_f: np.ndarray):
            mse = np.mean((x_hat_f - raw_f) ** 2)
            p = 10 * np.log10(1.0 / max(float(mse), 1e-12))
            m = (
                float(jit_msssim(jnp.asarray(x_hat_f)[None], jnp.asarray(raw_f)[None]))
                if do_msssim
                else None
            )
            return p, m

        if compress_iframe:
            rec0, i_bpp, i_psnr = code_iframe(gop[0], spec.I_level)
            _, i_ms = quality(rec0, gop[0])
            gop[0] = rec0
            bpp_meter.update(i_bpp)
            psnr_meter.update(i_psnr)
            all_psnr.append(i_psnr)
            if i_ms is not None:
                msssim_meter.update(i_ms)
                all_msssim.append(i_ms)
        padded, (h, w) = pad_to_multiple(gop, 64)
        # estimated-bits rollout (runs in both modes: bpp_est is logged as
        # an aux field next to bpp_act so drift is visible)
        t0 = time.perf_counter()
        x_hat, metrics = jit_rollout(params, jnp.asarray(padded))
        jax.block_until_ready(x_hat)
        dt = time.perf_counter() - t0
        scale = (padded.shape[-3] * padded.shape[-2]) / (h * w)
        bpps = np.asarray(metrics.get("bpp_est", metrics.get("bpp")))
        bpp_est_meter.update(float(np.mean(bpps)) * scale, T - 1)

        if real_bits:
            p_rec, key_rec, bits, enc_t, dec_t, enc_ac, dec_ac = _real_bits_gop(
                spec, params, jnp.asarray(padded)
            )
            x_hat = p_rec[:, :h, :w]
            if key_rec is not None:
                kp, km = quality(key_rec[:h, :w], gop[0])
                all_psnr.append(kp)
                psnr_meter.update(kp)
                if km is not None:
                    msssim_meter.update(km)
                    all_msssim.append(km)
            bpp_meter.update(bits / ((T - 1) * h * w), T - 1)
            enc_meter.update(enc_t / (T - 1), T - 1)
            dec_meter.update(dec_t / (T - 1), T - 1)
            enc_ac_meter.update(enc_ac / (T - 1), T - 1)
            dec_ac_meter.update(dec_ac / (T - 1), T - 1)
        else:
            enc_meter.update(dt / (T - 1), T - 1)
            dec_dt = _time_decode_only(spec, params, padded)
            dec_meter.update(
                (dec_dt if dec_dt is not None else dt) / (T - 1), T - 1
            )
            x_hat = np.asarray(x_hat)
            if x_hat.ndim == 5:  # [T-1, B=1, H, W, C]
                x_hat = x_hat[:, 0]
            x_hat = x_hat[:, :h, :w]
            bpp_meter.update(float(np.mean(bpps)) * scale, T - 1)

        for i in range(T - 1):
            p, m = quality(x_hat[i], gop[1 + i])
            all_psnr.append(p)
            psnr_meter.update(p)
            if m is not None:
                msssim_meter.update(m)
                all_msssim.append(m)
        gops_done += 1

        if eof and log_path:
            ms_avg = msssim_meter.avg if msssim_meter.count else 0.0
            aux = (
                (enc_ac_meter.avg, dec_ac_meter.avg, bpp_est_meter.avg, ms_avg)
                if real_bits
                else (ms_avg,)
            )
            # msssim loss mode logs the MS-SSIM quality list (what the
            # reference's msssim-mode plot parsing expects); PSNR otherwise
            quality_list = (
                all_msssim if spec.loss_type == "M" and all_msssim else all_psnr
            )
            write_eval_log(
                log_path, level, bpp_meter.avg, enc_meter.avg, dec_meter.avg,
                quality_list, aux=aux,
            )
            all_psnr = []
            all_msssim = []
        if max_gops and gops_done >= max_gops:
            break

    out = {
        "bpp": bpp_meter.avg,
        "bpp_est": bpp_est_meter.avg,
        "psnr": psnr_meter.avg,
        "msssim_db": msssim_meter.avg if msssim_meter.count else None,
        "sec_per_frame": enc_meter.avg,
        "dec_sec_per_frame": dec_meter.avg,
    }
    if real_bits:
        out["enc_ac_sec_per_frame"] = enc_ac_meter.avg
        out["dec_ac_sec_per_frame"] = dec_ac_meter.avg
    return out
