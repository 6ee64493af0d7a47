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
