"""Entropy-model tests mirroring the reference's entropy_models.py:380-459
smoke test: estimated bits sane, shapes right, quantized-CDF tables valid."""

import jax
import jax.numpy as jnp
import numpy as np

from fastvideocodec_tpu import ops
from fastvideocodec_tpu.entropy import (
    BitEstimator,
    EntropyBottleneck,
    GaussianConditional,
    LaplaceConditional,
    MeanScaleHyperPriors,
    RecProbModel,
    build_cdf_tables,
    pmf_to_quantized_cdf,
)

KEY = jax.random.PRNGKey(0)


class TestBitEstimator:
    def test_monotone_cdf(self):
        be = BitEstimator(channels=4)
        x = jnp.linspace(-20, 20, 41)[:, None] * jnp.ones((1, 4))
        params = be.init(KEY, x)
        y = np.asarray(be.apply(params, x))
        assert (np.diff(y, axis=0) >= -1e-6).all()
        assert (y >= 0).all() and (y <= 1).all()

    def test_likelihood_positive_sums_near_one(self):
        be = BitEstimator(channels=2)
        xs = jnp.arange(-100, 101, dtype=jnp.float32)[:, None] * jnp.ones((1, 2))
        params = be.init(KEY, xs)
        lik = np.asarray(be.apply(params, xs, method="likelihood"))
        assert (lik >= -1e-6).all()
        np.testing.assert_allclose(lik.sum(axis=0), 1.0, atol=0.05)


class TestEntropyBottleneck:
    def test_forward_shapes_and_noise(self):
        eb = EntropyBottleneck(channels=8)
        x = jax.random.normal(KEY, (2, 4, 4, 8)) * 3
        params = eb.init({"params": KEY}, x, training=False)
        x_hat, lik = eb.apply(params, x, training=False)
        assert x_hat.shape == x.shape and lik.shape == x.shape
        assert (np.asarray(lik) > 0).all()
        x_hat_t, _ = eb.apply(params, x, training=True, rng=KEY)
        assert float(jnp.abs(x_hat_t - x).max()) <= 0.5 + 1e-6

    def test_eval_rounds_to_median_offset(self):
        eb = EntropyBottleneck(channels=3)
        x = jax.random.normal(KEY, (1, 2, 2, 3))
        params = eb.init({"params": KEY}, x, training=False)
        x_hat, _ = eb.apply(params, x, training=False)
        med = np.asarray(eb.apply(params, method="medians"))
        got = np.asarray(x_hat)
        want = np.round(np.asarray(x) - med) + med
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_bits_est_close_to_entropy_for_gaussianish_latent(self):
        eb = EntropyBottleneck(channels=4)
        x = jax.random.normal(KEY, (4, 8, 8, 4)) * 2
        params = eb.init({"params": KEY}, x, training=False)
        _, lik = eb.apply(params, x, training=False)
        bits = float(ops.bits_estimate(lik))
        # untrained model: bits per symbol should at least be finite & positive
        assert 0 < bits < 50 * x.size

    def test_aux_loss_finite(self):
        eb = EntropyBottleneck(channels=4)
        x = jnp.zeros((1, 2, 2, 4))
        params = eb.init({"params": KEY}, x, training=False)
        aux = float(eb.apply(params, method="aux_loss"))
        assert np.isfinite(aux) and aux >= 0

    def test_cdf_tables_valid(self):
        eb = EntropyBottleneck(channels=4)
        x = jnp.zeros((1, 2, 2, 4))
        params = eb.init({"params": KEY}, x, training=False)["params"]
        cdfs, lengths, offsets = build_cdf_tables(jax.tree.map(np.asarray, params))
        assert cdfs.shape[0] == 4
        for c in range(4):
            L = lengths[c]
            row = cdfs[c, :L]
            assert row[-1] == 1 << 16
            assert (np.diff(row) >= 1).all()  # every symbol has freq >= 1


class TestPmfQuantize:
    def test_sums_to_precision(self):
        pmf = np.asarray([0.7, 0.2, 0.05, 0.05])
        cdf = pmf_to_quantized_cdf(pmf, 16)
        assert cdf[-1] == 1 << 16
        assert (np.diff(cdf) >= 1).all()

    def test_tiny_probs_get_one(self):
        pmf = np.asarray([1.0, 1e-12, 1e-12])
        cdf = pmf_to_quantized_cdf(pmf, 16)
        freq = np.diff(cdf)
        assert (freq >= 1).all() and freq.sum() == 1 << 16


class TestGaussianConditional:
    def test_forward_eval_quantizes_around_mean(self):
        gc = GaussianConditional()
        x = jnp.asarray([[0.3, 1.6, -2.2]])
        means = jnp.asarray([[0.1, 0.0, -0.5]])
        scales = jnp.ones_like(x)
        x_hat, lik = gc(x, scales, means=means, training=False)
        np.testing.assert_allclose(
            np.asarray(x_hat), np.round(np.asarray(x - means)) + np.asarray(means)
        )
        assert (np.asarray(lik) > 0).all()

    def test_cdf_tables(self):
        gc = GaussianConditional()
        cdfs, lengths, offsets = gc.build_cdf_tables()
        assert cdfs.shape[0] == 64
        for s in (0, 31, 63):
            row = cdfs[s, : lengths[s]]
            assert row[-1] == 1 << 16 and (np.diff(row) >= 1).all()


class TestLaplaceConditional:
    def test_tables_and_likelihood(self):
        lc = LaplaceConditional()
        cdfs, lengths, offsets = lc.build_cdf_tables(mxrange=150)
        assert (lengths <= 2 * 150 + 3).all()
        x = jnp.asarray([0.0, 1.0, -3.0])
        lik = lc.likelihood(x, jnp.full_like(x, 0.5))
        assert (np.asarray(lik) > 0).all()


class TestHyperPriors:
    def test_mean_scale_forward(self):
        m = MeanScaleHyperPriors(channels=16)
        x = jax.random.normal(KEY, (2, 8, 8, 16))
        params = m.init({"params": KEY}, x, training=False)
        x_hat, (x_lik, z_lik), sigma, mu = m.apply(params, x, training=False)
        assert x_hat.shape == x.shape
        assert x_lik.shape == x.shape and z_lik.shape == x.shape
        assert (np.asarray(sigma) > 0).all()

    def test_rec_prob_model_branches(self):
        rpm = RecProbModel(channels=8)
        x = jax.random.normal(KEY, (1, 4, 4, 8))
        hidden = jnp.zeros((1, 4, 4, 16))
        prior = jnp.zeros_like(x)
        params = rpm.init(
            {"params": KEY}, x, hidden, False, prior, training=False
        )
        out_f = rpm.apply(params, x, hidden, False, prior, training=False)
        out_g = rpm.apply(params, x, hidden, True, prior, training=False)
        # factorized branch leaves hidden untouched; RPM branch updates it
        assert np.allclose(np.asarray(out_f[2]), np.asarray(hidden))
        assert out_f[0].shape == x.shape and out_g[0].shape == x.shape
