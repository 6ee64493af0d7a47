"""Range-coder roundtrip + bits_est vs bits_act parity (the reference's core
entropy invariant, entropy_models.py:444-451)."""

import numpy as np
import pytest

from fastvideocodec_tpu.coder import decode_with_indexes, encode_with_indexes
from fastvideocodec_tpu.entropy import GaussianConditional, LaplaceConditional
from fastvideocodec_tpu.entropy.factorized import pmf_to_quantized_cdf


def _simple_tables(scales=(0.5, 1.0, 4.0), support=8):
    """Gaussian-ish tables over [-support, support] per scale."""
    from scipy.stats import norm

    rows = []
    for s in scales:
        xs = np.arange(-support, support + 1)
        pmf = norm.cdf(xs + 0.5, 0, s) - norm.cdf(xs - 0.5, 0, s)
        pmf = np.concatenate([pmf, [1e-9]])  # escape bucket
        rows.append(pmf_to_quantized_cdf(pmf, 16))
    L = max(len(r) for r in rows)
    cdfs = np.zeros((len(rows), L), dtype=np.uint32)
    lengths = np.zeros(len(rows), dtype=np.int32)
    for i, r in enumerate(rows):
        cdfs[i, : len(r)] = r
        lengths[i] = len(r)
    offsets = np.full(len(rows), -support, dtype=np.int32)
    return cdfs, lengths, offsets


class TestRoundtrip:
    def test_inrange_roundtrip(self):
        rng = np.random.RandomState(0)
        cdfs, lengths, offsets = _simple_tables()
        n = 5000
        indexes = rng.randint(0, 3, n)
        scale_of = np.asarray([0.5, 1.0, 4.0])[indexes]
        symbols = np.round(rng.randn(n) * scale_of).astype(np.int32)
        symbols = np.clip(symbols, -8, 7)
        data = encode_with_indexes(symbols, indexes, cdfs, lengths, offsets)
        out = decode_with_indexes(data, indexes, cdfs, lengths, offsets)
        np.testing.assert_array_equal(out, symbols)

    def test_overflow_escape_roundtrip(self):
        rng = np.random.RandomState(1)
        cdfs, lengths, offsets = _simple_tables(support=4)
        n = 1000
        indexes = rng.randint(0, 3, n)
        symbols = rng.randint(-100, 100, n).astype(np.int32)  # mostly overflow
        data = encode_with_indexes(symbols, indexes, cdfs, lengths, offsets)
        out = decode_with_indexes(data, indexes, cdfs, lengths, offsets)
        np.testing.assert_array_equal(out, symbols)

    def test_bits_act_close_to_entropy(self):
        """actual bits within a few % of the model entropy for matched data."""
        rng = np.random.RandomState(2)
        cdfs, lengths, offsets = _simple_tables(scales=(2.0,), support=32)
        n = 200_000
        symbols = np.clip(np.round(rng.randn(n) * 2.0), -32, 31).astype(np.int32)
        indexes = np.zeros(n, dtype=np.int32)
        data = encode_with_indexes(symbols, indexes, cdfs, lengths, offsets)
        bits_act = len(data) * 8
        from scipy.stats import norm

        xs = np.arange(-32, 33)
        pmf = norm.cdf(xs + 0.5, 0, 2.0) - norm.cdf(xs - 0.5, 0, 2.0)
        entropy = -(pmf * np.log2(np.maximum(pmf, 1e-30))).sum()
        bits_est = entropy * n
        assert abs(bits_act - bits_est) / bits_est < 0.03, (bits_act, bits_est)

    def test_empty_and_single(self):
        cdfs, lengths, offsets = _simple_tables()
        for symbols in ([], [3]):
            s = np.asarray(symbols, dtype=np.int32)
            idx = np.zeros(len(s), dtype=np.int32)
            data = encode_with_indexes(s, idx, cdfs, lengths, offsets)
            out = decode_with_indexes(data, idx, cdfs, lengths, offsets)
            np.testing.assert_array_equal(out, s)


class TestModelTablesRoundtrip:
    def test_gaussian_conditional_tables(self):
        gc = GaussianConditional()
        cdfs, lengths, offsets = gc.build_cdf_tables()
        rng = np.random.RandomState(3)
        scales = np.exp(rng.uniform(np.log(0.12), np.log(10), 4096)).astype(np.float32)
        import jax.numpy as jnp

        indexes = np.asarray(gc.build_indexes(jnp.asarray(scales)))
        symbols = np.round(rng.randn(4096) * scales).astype(np.int32)
        data = encode_with_indexes(symbols, indexes, cdfs, lengths, offsets)
        out = decode_with_indexes(data, indexes, cdfs, lengths, offsets)
        np.testing.assert_array_equal(out, symbols)
        # sanity: compression actually happens for small scales
        assert len(data) * 8 < 16 * 4096

    def test_laplace_conditional_tables(self):
        lc = LaplaceConditional()
        cdfs, lengths, offsets = lc.build_cdf_tables(mxrange=150)
        rng = np.random.RandomState(4)
        scales = np.exp(rng.uniform(np.log(0.12), np.log(20), 2048)).astype(np.float32)
        import jax.numpy as jnp

        indexes = np.asarray(lc.build_indexes(jnp.asarray(scales)))
        symbols = np.round(rng.laplace(0, scales)).astype(np.int32)
        data = encode_with_indexes(symbols, indexes, cdfs, lengths, offsets)
        out = decode_with_indexes(data, indexes, cdfs, lengths, offsets)
        np.testing.assert_array_equal(out, symbols)
