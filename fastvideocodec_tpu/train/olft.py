"""OLFT online fine-tuning support: touch-up pixel sampling.

Reference replace_elements (models.py:2192-2235): pick the top-r% pixels by
|recon - raw|, replace them in the recon to build an online training label,
and account their bandwidth cost by zlib-compressing (delta bytes + mask
bitmap). The top-k selection runs on device (one jit'd op); the zlib cost
accounting is host-side."""

from __future__ import annotations

import zlib

import jax
import jax.numpy as jnp
import numpy as np


def touchup_labels(recon: jax.Array, raw: jax.Array, ratio: float):
    """Device-side: returns (label, mask) where label = recon with the
    top-`ratio` pixels (by abs error) replaced by raw values."""
    if ratio <= 0:
        return recon, jnp.zeros_like(recon, dtype=bool)
    diff = jnp.abs(recon - raw).ravel()
    k = int(ratio * diff.size)
    thresh = jax.lax.top_k(diff, k)[0][-1]
    mask = (jnp.abs(recon - raw) >= thresh)
    label = jnp.where(mask, raw, recon)
    return label, mask


def touchup_bits(recon: np.ndarray, label: np.ndarray, mask: np.ndarray,
                 use_compression: bool = True) -> int:
    """Host-side bandwidth cost in bytes (models.py:2218-2233): zlib of the
    changed-value deltas (uint8) plus the boolean location bitmap."""
    if not mask.any():
        return 0
    if use_compression:
        deltas = ((label - recon) * 255.0).astype(np.uint8)[mask]
        payload = deltas.tobytes() + np.packbits(mask.astype(np.uint8)).tobytes()
        return len(zlib.compress(payload))
    return len((label * 255.0).astype(np.uint8).tobytes())


def probe_sample_interval(
    spec,
    params,
    dataset,
    sample_ratio: float,
    bw_limit_bps: float,
    fps: float = 30.0,
    num_gops: int = 2,
    rng=None,
) -> int:
    """Bandwidth probe (reference probe_sample_interval,
    train_multiview.py:392-406): run a few GOPs of the OLFT touch-up path,
    measure the touch-up data rate at sampling-every-frame, and return the
    frame sampling interval that fits under `bw_limit_bps`."""
    from functools import partial

    from fastvideocodec_tpu.gop import rollout

    rng = np.random.default_rng(0) if rng is None else rng
    jroll = jax.jit(partial(rollout, spec, training=False, rng=None))
    jlabel = jax.jit(partial(touchup_labels, ratio=sample_ratio))
    total_bits = 0
    total_frames = 0
    for g in range(num_gops):
        idx = int(rng.integers(0, len(dataset)))
        gop = jnp.asarray(dataset[idx])
        mask = jnp.ones((gop.shape[1],))
        recons, _ = jroll(params, gop, mask=mask)
        labels, masks = jlabel(recons, gop)
        total_bits += 8 * touchup_bits(
            np.asarray(recons), np.asarray(labels), np.asarray(masks)
        )
        total_frames += gop.shape[0]
    rate_bps = total_bits / max(total_frames, 1) * fps
    return max(1, int(np.ceil(rate_bps / max(bw_limit_bps, 1.0))))
