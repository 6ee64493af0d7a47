"""Factorized entropy bottleneck (Ballé et al. 2018 appendix 6.1).

Functional re-derivation of compressai's EntropyBottleneck, which the
reference leans on everywhere (entropy_models.py:9, models.py:1861-1862,
1962, 1978): a per-channel non-parametric cumulative F(x) built from K
monotone layers, with

- training: additive U(-0.5, 0.5) noise; eval: round to the channel median,
- likelihood = sigmoid-diff of the cumulative logits with the sign trick,
- a `quantiles` parameter pinned to (tail, median, tail) by an auxiliary
  loss so real coding gets well-defined integer support.

Device-side everything is vectorized over channels; the quantized CDF table
for the host range coder is built in `build_cdf_tables` (numpy, host).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from fastvideocodec_tpu.ops.math import LIKELIHOOD_LOWER_BOUND, lower_bound


class EntropyBottleneck(nn.Module):
    channels: int
    filters: tuple = (3, 3, 3, 3)
    init_scale: float = 10.0
    tail_mass: float = 1e-9

    def setup(self):
        ch = self.channels
        filters = (1,) + tuple(self.filters) + (1,)
        k = len(self.filters) + 1
        scale = self.init_scale ** (1.0 / k)
        matrices, biases, factors = [], [], []
        for i in range(k):
            init_m = float(np.log(np.expm1(1.0 / scale / filters[i + 1])))
            matrices.append(
                self.param(
                    f"matrix_{i}",
                    lambda _, s=init_m, sh=(ch, filters[i + 1], filters[i]): jnp.full(sh, s),
                )
            )
            biases.append(
                self.param(
                    f"bias_{i}",
                    lambda key, sh=(ch, filters[i + 1], 1): jax.random.uniform(
                        key, sh, minval=-0.5, maxval=0.5
                    ),
                )
            )
            if i < k - 1:
                factors.append(
                    self.param(
                        f"factor_{i}",
                        lambda _, sh=(ch, filters[i + 1], 1): jnp.zeros(sh),
                    )
                )
        self._matrices = matrices
        self._biases = biases
        self._factors = factors
        self.quantiles = self.param(
            "quantiles",
            lambda _: jnp.tile(
                jnp.asarray([-self.init_scale, 0.0, self.init_scale]), (ch, 1, 1)
            ),
        )

    def _make_params(self):
        return self._matrices, self._biases, self._factors

    def _quantiles(self):
        return self.quantiles

    @staticmethod
    def _logits_cumulative(x, matrices, biases, factors):
        """x: [C, 1, N] -> logits [C, 1, N]."""
        logits = x
        k = len(matrices)
        for i in range(k):
            m = jax.nn.softplus(matrices[i])
            logits = jnp.einsum("cof,cfn->con", m, logits) + biases[i]
            if i < k - 1:
                logits = logits + jnp.tanh(factors[i]) * jnp.tanh(logits)
        return logits

    def __call__(self, x, training: bool, rng=None):
        """x: [..., C]. Returns (x_hat, likelihoods) with the same shape."""
        matrices, biases, factors = self._make_params()
        quantiles = self._quantiles()
        medians = jax.lax.stop_gradient(quantiles[:, 0, 1])

        if training:
            assert rng is not None
            x_hat = x + jax.random.uniform(rng, x.shape, x.dtype, -0.5, 0.5)
        else:
            x_hat = jnp.round(x - medians) + medians

        # channel-major flattening for the per-channel cumulative
        v = jnp.moveaxis(x_hat, -1, 0).reshape(self.channels, 1, -1)
        lower = self._logits_cumulative(v - 0.5, matrices, biases, factors)
        upper = self._logits_cumulative(v + 0.5, matrices, biases, factors)
        sign = jax.lax.stop_gradient(-jnp.sign(lower + upper))
        likelihood = jnp.abs(
            jax.nn.sigmoid(sign * upper) - jax.nn.sigmoid(sign * lower)
        )
        likelihood = lower_bound(likelihood, LIKELIHOOD_LOWER_BOUND)
        likelihood = jnp.moveaxis(
            likelihood.reshape((self.channels,) + x.shape[:-1]), 0, -1
        )
        return x_hat, likelihood

    def aux_loss(self):
        """Pins quantiles to (tail_mass/2, 0.5, 1-tail_mass/2) of F.

        Matches compressai's `EntropyBottleneck.loss()`; the trainer adds
        this with its own optimizer group (reference train.py aux optimizer).
        """
        matrices, biases, factors = self._make_params()
        # only the quantiles receive this gradient (compressai optimizes
        # aux_loss with a dedicated optimizer over '.quantiles' params)
        sg = jax.lax.stop_gradient
        matrices = [sg(m) for m in matrices]
        biases = [sg(b) for b in biases]
        factors = [sg(f) for f in factors]
        quantiles = self._quantiles()
        logits = self._logits_cumulative(quantiles, matrices, biases, factors)
        target = float(np.log(2.0 / self.tail_mass - 1.0))
        t = jnp.asarray([-target, 0.0, target])
        return jnp.sum(jnp.abs(logits - t))

    def medians(self):
        return self._quantiles()[:, 0, 1]


def logits_cumulative_numpy(params: dict, x: np.ndarray, filters_n: int) -> np.ndarray:
    """Host-side replica of _logits_cumulative for CDF-table construction.

    params: the bottleneck's param dict (numpy-able); x: [C, 1, N].
    """
    logits = x
    for i in range(filters_n):
        m = np.logaddexp(0.0, np.asarray(params[f"matrix_{i}"]))  # softplus
        logits = np.einsum("cof,cfn->con", m, logits) + np.asarray(params[f"bias_{i}"])
        if i < filters_n - 1:
            f = np.tanh(np.asarray(params[f"factor_{i}"]))
            logits = logits + f * np.tanh(logits)
    return logits


def build_cdf_tables(
    params: dict,
    filters: tuple = (3, 3, 3, 3),
    precision: int = 16,
    tail_mass: float = 1e-9,
):
    """Quantized per-channel CDFs for the host range coder.

    Returns (cdf [C, Lmax+2] uint32 cumulative freq scaled to 2^precision,
    cdf_lengths [C], offsets [C]) — the same contract compressai's
    `update()` produces for its rANS coder (entropy_models.py:83-94 usage).
    """
    quantiles = np.asarray(params["quantiles"])  # [C,1,3]
    medians = quantiles[:, 0, 1]
    minima = np.ceil(medians - quantiles[:, 0, 0]).astype(np.int64)
    maxima = np.ceil(quantiles[:, 0, 2] - medians).astype(np.int64)
    minima = np.maximum(minima, 0)
    maxima = np.maximum(maxima, 0)
    offsets = -minima
    C = medians.shape[0]
    pmf_lengths = maxima + minima + 1
    max_len = int(pmf_lengths.max())

    samples = np.arange(max_len, dtype=np.float64)[None, None, :] - minima[:, None, None]
    samples = samples + medians[:, None, None]

    k = len(filters) + 1
    lower = logits_cumulative_numpy(params, samples - 0.5, k)
    upper = logits_cumulative_numpy(params, samples + 0.5, k)
    sign = -np.sign(lower + upper)

    def sigmoid(v):
        return 1.0 / (1.0 + np.exp(-v))

    pmf = np.abs(sigmoid(sign * upper) - sigmoid(sign * lower))[:, 0, :]  # [C, L]

    # tail mass outside the modeled support goes into one extra bucket
    tail = sigmoid(lower[:, 0, :1]) + sigmoid(-upper[:, 0, -1:])
    cdfs = np.zeros((C, max_len + 2), dtype=np.uint32)
    lengths = np.zeros((C,), dtype=np.int32)
    for c in range(C):
        L = int(pmf_lengths[c])
        p = np.concatenate([pmf[c, :L], tail[c]])
        cdfs[c, : L + 2] = pmf_to_quantized_cdf(p, precision)
        lengths[c] = L + 2
    return cdfs, lengths, offsets.astype(np.int32)


def pmf_to_quantized_cdf(pmf: np.ndarray, precision: int = 16) -> np.ndarray:
    """Quantize a pmf to a cumulative distribution summing to 2^precision.

    Every symbol keeps frequency >= 1 (steals from the largest buckets),
    like compressai's C++ `pmf_to_quantized_cdf`.
    """
    pmf = np.clip(np.nan_to_num(pmf, nan=0.0), 0.0, None).astype(np.float64)
    total = 1 << precision
    freq = np.round(pmf / max(pmf.sum(), 1e-30) * total).astype(np.int64)
    freq = np.maximum(freq, 1)
    excess = int(freq.sum() - total)
    while excess > 0:
        i = int(np.argmax(freq))
        take = min(excess, int(freq[i] - 1))
        if take <= 0:
            # distribute one by one from all >1 buckets
            for j in np.argsort(-freq):
                if excess == 0:
                    break
                if freq[j] > 1:
                    freq[j] -= 1
                    excess -= 1
            break
        freq[i] -= take
        excess -= take
    while excess < 0:
        i = int(np.argmax(freq))
        freq[i] += -excess
        excess = 0
    cdf = np.zeros(len(freq) + 1, dtype=np.uint32)
    cdf[1:] = np.cumsum(freq)
    return cdf
