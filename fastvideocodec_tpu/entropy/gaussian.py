"""Conditional Gaussian / Laplace entropy models.

Functional equivalents of compressai's GaussianConditional (used by RLVC's
RecProbModel, the hyperpriors and SSF — reference entropy_models.py:38,
162; models.py:1966) plus the Laplace rate model LSVC/Base use
(models.py:1216-1245).

Real-bitstream coding uses a fixed scale table: each latent is bucketed to
one of SCALES_LEVELS scales (build_indexes) and coded with that scale's
quantized CDF over a bounded integer support. The tables are built once on
the host (numpy) and shared with the C++ range coder.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from scipy.stats import norm as _scipy_norm

from fastvideocodec_tpu.entropy.factorized import pmf_to_quantized_cdf
from fastvideocodec_tpu.ops import math as om


class GaussianConditional:
    """Stateless helper bundling the forward likelihood and coding tables."""

    def __init__(self, scale_table: np.ndarray | None = None, scale_bound: float = 0.11):
        self.scale_bound = scale_bound
        self.table = (
            np.asarray(scale_table)
            if scale_table is not None
            else np.asarray(om.scale_table())
        )

    def __call__(self, x, scales, means=None, training=False, rng=None):
        """Returns (x_hat, likelihoods): noise-quantized when training, else
        round(x - means) + means (compressai 'dequantize' mode)."""
        if training:
            x_hat = om.quantize_noise(x, rng)
        else:
            if means is not None:
                x_hat = jnp.round(x - means) + means
            else:
                x_hat = jnp.round(x)
        likelihoods = om.gaussian_likelihood(
            x_hat, scales, means, scale_lower_bound=self.scale_bound
        )
        return x_hat, likelihoods

    def build_indexes(self, scales):
        return om.build_indexes(scales, jnp.asarray(self.table))

    def build_cdf_tables(self, precision: int = 16, mxrange: int | None = None):
        """Quantized CDFs per table scale: (cdfs [S, L+2], lengths, offsets).

        Support per scale follows compressai: half-width
        ceil(scale * sqrt(2) * erfinv-based tail) but we use a simpler
        tail-mass cut at 1e-9 like its `update()`.
        """
        tail_mass = 1e-9
        multiplier = -_scipy_norm.ppf(tail_mass / 2)
        pmf_center = np.ceil(self.table * multiplier).astype(np.int64)
        if mxrange is not None:
            pmf_center = np.minimum(pmf_center, mxrange)
        S = len(self.table)
        max_len = int((2 * pmf_center + 1).max())
        cdfs = np.zeros((S, max_len + 2), dtype=np.uint32)
        lengths = np.zeros((S,), dtype=np.int32)
        offsets = (-pmf_center).astype(np.int32)
        for s in range(S):
            c = int(pmf_center[s])
            samples = np.arange(-c, c + 1, dtype=np.float64)
            up = _scipy_norm.cdf((samples + 0.5) / self.table[s])
            lo = _scipy_norm.cdf((samples - 0.5) / self.table[s])
            pmf = up - lo
            tail = 2 * _scipy_norm.cdf((-c - 0.5) / self.table[s])
            p = np.concatenate([pmf, [max(tail, 1e-12)]])
            q = pmf_to_quantized_cdf(p, precision)
            cdfs[s, : len(q)] = q
            lengths[s] = len(q)
        return cdfs, lengths, offsets


class LaplaceConditional:
    """Laplace(0, sigma) rate model (reference feature_probs_based_sigma,
    models.py:1216-1245). Zero-mean; sigma clamped to [1e-5, 1e10]."""

    def __init__(self, scale_table: np.ndarray | None = None):
        self.table = (
            np.asarray(scale_table)
            if scale_table is not None
            else np.asarray(om.scale_table())
        )

    def likelihood(self, x, sigma):
        return om.laplace_likelihood(x, sigma)

    def build_indexes(self, scales):
        return om.build_indexes(scales, jnp.asarray(self.table))

    def build_cdf_tables(self, precision: int = 16, mxrange: int = 150):
        """Per-scale quantized Laplace CDFs over [-mxrange, mxrange]."""
        S = len(self.table)

        def lap_cdf(v, b):
            return np.where(v < 0, 0.5 * np.exp(v / b), 1 - 0.5 * np.exp(-v / b))

        tail_mass = 1e-9
        half = np.ceil(-self.table * np.log(tail_mass)).astype(np.int64)
        half = np.minimum(np.maximum(half, 1), mxrange)
        max_len = int((2 * half + 1).max())
        cdfs = np.zeros((S, max_len + 2), dtype=np.uint32)
        lengths = np.zeros((S,), dtype=np.int32)
        offsets = (-half).astype(np.int32)
        for s in range(S):
            c = int(half[s])
            samples = np.arange(-c, c + 1, dtype=np.float64)
            pmf = lap_cdf(samples + 0.5, self.table[s]) - lap_cdf(
                samples - 0.5, self.table[s]
            )
            tail = 2 * lap_cdf(-c - 0.5, self.table[s])
            p = np.concatenate([pmf, [max(tail, 1e-12)]])
            q = pmf_to_quantized_cdf(p, precision)
            cdfs[s, : len(q)] = q
            lengths[s] = len(q)
        return cdfs, lengths, offsets
