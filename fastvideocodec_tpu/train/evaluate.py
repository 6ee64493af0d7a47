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


def code_iframe(frame: np.ndarray, i_level: int):
    """BPG I-frame when the binary exists (models.py:412-429); otherwise a
    null I-codec that passes the frame through and charges 24 bpp (honest
    upper bound, clearly flagged in the log aux fields)."""
    if have_bpg():
        return bpg_compress_iframe(frame, i_level)
    mse = 1e-12
    return frame.copy(), 24.0, 10 * np.log10(1.0 / mse)


def evaluate_video(
    spec: CodecSpec,
    params,
    dataset,
    gop_size: int = 16,
    log_path: str | None = None,
    level: int = 0,
    compress_iframe: bool = True,
    max_gops: int = 0,
):
    """Runs the whole dataset; returns dict of aggregates. Appends one
    2-line record per video to log_path when eof is reached."""
    jit_rollout = jax.jit(
        partial(rollout, spec, training=False, rng=None)
    )
    bpp_meter = AverageMeter()
    psnr_meter = AverageMeter()
    enc_meter = AverageMeter()
    all_psnr: list[float] = []
    buf: list[np.ndarray] = []
    gops_done = 0

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
        if compress_iframe:
            rec0, i_bpp, i_psnr = code_iframe(gop[0], spec.I_level)
            gop[0] = rec0
            bpp_meter.update(i_bpp)
            psnr_meter.update(i_psnr)
            all_psnr.append(i_psnr)
        padded, (h, w) = pad_to_multiple(gop, 64)
        t0 = time.perf_counter()
        x_hat, metrics = jit_rollout(params, jnp.asarray(padded))
        jax.block_until_ready(x_hat)
        dt = time.perf_counter() - t0
        enc_meter.update(dt / (T - 1), T - 1)

        x_hat = np.asarray(x_hat)
        if x_hat.ndim == 5:  # [T-1, B=1, H, W, C]
            x_hat = x_hat[:, 0]
        x_hat = x_hat[:, :h, :w]
        for i in range(T - 1):
            mse = np.mean((x_hat[i] - gop[1 + i]) ** 2)
            p = 10 * np.log10(1.0 / max(mse, 1e-12))
            all_psnr.append(p)
            psnr_meter.update(p)
        scale = (padded.shape[-3] * padded.shape[-2]) / (h * w)
        bpps = np.asarray(metrics.get("bpp_est", metrics.get("bpp")))
        bpp_meter.update(float(np.mean(bpps)) * scale, T - 1)
        gops_done += 1

        if eof and log_path:
            write_eval_log(
                log_path, level, bpp_meter.avg, enc_meter.avg, enc_meter.avg,
                all_psnr,
            )
            all_psnr = []
        if max_gops and gops_done >= max_gops:
            break

    return {
        "bpp": bpp_meter.avg,
        "psnr": psnr_meter.avg,
        "sec_per_frame": enc_meter.avg,
    }
