"""Real-bitstream invariants (reference entropy_models.py:380-459 test):
encode -> decode reproduces the quantized forward exactly, and actual bits
track estimated bits."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastvideocodec_tpu import ops
from fastvideocodec_tpu.coder.service import (
    BitEstimatorCodec,
    FactorizedCodec,
    GaussianCodec,
)
from fastvideocodec_tpu.entropy import BitEstimator, EntropyBottleneck

KEY = jax.random.PRNGKey(0)


class TestFactorizedRoundtrip:
    def test_decode_matches_forward(self):
        eb = EntropyBottleneck(channels=6)
        x = jax.random.normal(KEY, (2, 8, 8, 6)) * 3
        variables = eb.init({"params": KEY}, x, training=False)
        x_hat_fwd, lik = eb.apply(variables, x, training=False)

        codec = FactorizedCodec(
            jax.tree.map(np.asarray, variables["params"])
        )
        data = codec.compress(np.asarray(x))
        x_hat_real = codec.decompress(data, x.shape)
        np.testing.assert_allclose(x_hat_real, np.asarray(x_hat_fwd), atol=1e-5)

    def test_bits_act_tracks_bits_est(self):
        eb = EntropyBottleneck(channels=4)
        x = jax.random.normal(KEY, (4, 16, 16, 4)) * 2
        variables = eb.init({"params": KEY}, x, training=False)
        _, lik = eb.apply(variables, x, training=False)
        bits_est = float(ops.bits_estimate_unclamped(lik))
        codec = FactorizedCodec(jax.tree.map(np.asarray, variables["params"]))
        bits_act = len(codec.compress(np.asarray(x))) * 8
        # fresh-init model: distributions are wide, overhead small
        assert abs(bits_act - bits_est) / bits_est < 0.10, (bits_act, bits_est)


class TestGaussianRoundtrip:
    def test_decode_matches_quantization(self):
        rng = np.random.RandomState(0)
        x = rng.randn(2, 8, 8, 16).astype(np.float32) * 2
        means = rng.randn(2, 8, 8, 16).astype(np.float32) * 0.3
        scales = np.exp(rng.uniform(-1, 2, (2, 8, 8, 16))).astype(np.float32)
        codec = GaussianCodec()
        data = codec.compress(x, scales, means)
        out = codec.decompress(data, scales, means)
        np.testing.assert_allclose(out, np.round(x - means) + means, atol=1e-5)


class TestBitEstimatorRoundtrip:
    def test_decode_and_bits(self):
        be = BitEstimator(channels=8)
        x = jnp.asarray(np.random.RandomState(1).randn(2, 4, 4, 8) * 4, jnp.float32)
        variables = be.init(KEY, x)
        codec = BitEstimatorCodec(jax.tree.map(np.asarray, variables["params"]))
        data = codec.compress(np.asarray(x))
        out = codec.decompress(data, x.shape)
        np.testing.assert_array_equal(out, np.round(np.asarray(x)))
        lik = be.apply(variables, jnp.round(x), method="likelihood")
        bits_est = float(ops.bits_estimate(lik))
        bits_act = len(data) * 8
        assert abs(bits_act - bits_est) / max(bits_est, 1) < 0.15, (bits_act, bits_est)


@pytest.mark.slow
class TestLsvcRealBitstream:
    def test_encode_decode_identity_and_bits(self):
        from fastvideocodec_tpu.coder.video import lsvc_compress, lsvc_decompress
        from fastvideocodec_tpu.models import get_codec_model

        spec = get_codec_model("LSVC-128")
        T, H, W = 4, 64, 128
        gop = jax.random.uniform(KEY, (T, H, W, 3))
        params = jax.jit(partial(spec.module.init, training=False))(
            {"params": KEY}, gop
        )
        streams, recon_enc, bits = lsvc_compress(spec, params, gop)
        recon_dec = lsvc_decompress(spec, params, gop[0], streams, T - 1)
        # the decoder sees only (I-frame, bitstreams): reconstructions must
        # match the encoder's exactly (tree decode == tree encode)
        np.testing.assert_allclose(
            np.asarray(recon_dec), np.asarray(recon_enc), atol=1e-5
        )
        assert bits > 0
        # actual bits should be within a factor ~2 of the estimate for a
        # fresh-init model (estimates use the clamp(0,50)+1e-5 variant)
        _, _, _, metrics = spec.module.apply(params, gop, training=False)
        bits_est = float(metrics["bpp"]) * (T - 1) * H * W
        assert bits < 4 * bits_est


@pytest.mark.slow
class TestLsvcTpuRealBitstream:
    def test_encode_decode_identity(self):
        """The TPU-native s2d config must keep decode == encode-recon: the
        coder folds frames to the s2d domain, estimates flow on the pooled
        RGB pyramid, and emits full-resolution frames."""
        from fastvideocodec_tpu.coder.video import lsvc_compress, lsvc_decompress
        from fastvideocodec_tpu.models import get_codec_model

        spec = get_codec_model("LSVC-TPU")
        T, H, W = 3, 64, 128
        gop = jax.random.uniform(KEY, (T, H, W, 3))
        params = jax.jit(partial(spec.module.init, training=False))(
            {"params": KEY}, gop
        )
        streams, recon_enc, bits = lsvc_compress(spec, params, gop)
        assert recon_enc.shape == (T - 1, H, W, 3)
        recon_dec = lsvc_decompress(spec, params, gop[0], streams, T - 1)
        np.testing.assert_allclose(
            np.asarray(recon_dec), np.asarray(recon_enc), atol=1e-5
        )
        assert bits > 0


@pytest.mark.slow
class TestSsfRealBitstream:
    # 'SSF-TPU': s2d transforms + polyphase decoders (round-4 Vesper speed
    # item); the real-bits path must reproduce encode exactly for the TPU
    # variant too.
    @pytest.mark.parametrize("name", ["SSF-Official", "SSF-TPU-TINY"])
    def test_encode_decode_identity(self, name):
        from fastvideocodec_tpu.coder.video import ssf_compress_gop, ssf_decompress_gop
        from fastvideocodec_tpu.models import get_codec_model

        spec = get_codec_model(name)
        gop = jax.random.uniform(KEY, (3, 1, 128, 128, 3))
        params = jax.jit(partial(spec.module.init, training=False))(
            {"params": KEY}, gop[:2]
        )
        streams, recon, bits = ssf_compress_gop(spec, params, gop)
        dec = ssf_decompress_gop(spec, params, streams)
        np.testing.assert_allclose(np.asarray(dec), np.asarray(recon), atol=1e-5)
        assert bits > 0


@pytest.mark.slow
class TestRlvcRealBitstream:
    def test_encode_decode_identity(self):
        from fastvideocodec_tpu.coder.video import (
            rlvc_compress_gop,
            rlvc_decompress_gop,
        )
        from fastvideocodec_tpu.models import get_codec_model

        spec = get_codec_model("RLVC")
        T, H, W = 4, 64, 64
        gop = jax.random.uniform(KEY, (T, H, W, 3))
        hidden = spec.module.init_hidden(1, H, W)
        params = jax.jit(partial(spec.module.init, training=False))(
            {"params": KEY}, gop[0][None], gop[1][None], hidden, False
        )
        streams, recon, bits, shapes = rlvc_compress_gop(spec, params, gop)
        dec = rlvc_decompress_gop(spec, params, gop[0], streams, shapes)
        np.testing.assert_allclose(np.asarray(dec), np.asarray(recon), atol=1e-5)
        assert bits > 0

    def test_rlvc_hp_mshyper_encode_decode_identity(self):
        """RLVC-HP: MeanScaleHyperPriors entropy in both Coder2Ds
        (reference entropy_models.py:150-324). z codes via the factorized
        bottleneck tables, the latent via the Gaussian coder with decoded
        (sigma, mu) in ONE host-coder call per tensor (entropy_trick
        semantics, :278-290). Also pins est-vs-actual bits: the concat'd
        (x, z) likelihoods from the estimate must track the two streams."""
        from fastvideocodec_tpu.coder.video import (
            rlvc_compress_gop,
            rlvc_decompress_gop,
        )
        from fastvideocodec_tpu.gop import rollout
        from fastvideocodec_tpu.models import get_codec_model

        spec = get_codec_model("RLVC-HP-TINY")
        T, H, W = 3, 64, 64
        gop = jax.random.uniform(jax.random.PRNGKey(3), (T, H, W, 3))
        hidden = spec.module.init_hidden(1, H, W)
        params = jax.jit(partial(spec.module.init, training=False))(
            {"params": KEY}, gop[0][None], gop[1][None], hidden, False
        )
        streams, recon, bits, shapes = rlvc_compress_gop(spec, params, gop)
        dec = rlvc_decompress_gop(spec, params, gop[0], streams, shapes)
        np.testing.assert_allclose(np.asarray(dec), np.asarray(recon), atol=1e-5)
        assert bits > 0
        # estimated bits from the rollout's concat'd likelihoods: a
        # random-init model's actual bits track the estimate loosely
        _, metrics = jax.jit(partial(rollout, spec, training=False, rng=None))(
            params, gop
        )
        bits_est = float(jnp.sum(metrics["bpp_est"])) * H * W
        assert bits < 4 * bits_est + 512, (bits, bits_est)


@pytest.mark.slow
class TestElfvcRealBitstream:
    @pytest.mark.parametrize(
        "name,sp_stage",
        [("ELFVC", 1), ("ELFVC-SP", 2), ("ELFVC-SP-TPU-TINY", 2)],
    )
    def test_encode_decode_identity(self, name, sp_stage):
        """Delta-motion chain (reference models.py:2087-2097): the decoder
        reconstructs from (bitstreams, decoded context) only; with -SP both
        sides re-run the SPnet on decoded symbols."""
        from fastvideocodec_tpu.coder.video import (
            elfvc_compress_gop,
            elfvc_decompress_gop,
        )
        from fastvideocodec_tpu.models import get_codec_model

        spec = get_codec_model(name, sp_stage=sp_stage)
        gop = jax.random.uniform(KEY, (3, 1, 128, 128, 3))
        params = jax.jit(partial(spec.module.init, training=False))(
            {"params": KEY}, gop[:2]
        )
        streams, recon, bits = elfvc_compress_gop(spec, params, gop)
        dec = elfvc_decompress_gop(spec, params, streams)
        np.testing.assert_allclose(np.asarray(dec), np.asarray(recon), atol=1e-5)
        assert bits > 0


@pytest.mark.slow
class TestMcvcRealBitstream:
    def test_encode_decode_identity_masked_views(self):
        """Masked-view joint coding + backup cross-view-attention decode
        (reference models.py:2354-2400): the receiver reproduces both the
        reference chain and the enhanced frames from bitstreams + the
        transmitted failed-view mask."""
        from fastvideocodec_tpu.coder.video import (
            mcvc_compress_gop,
            mcvc_decompress_gop,
        )
        from fastvideocodec_tpu.models import get_codec_model

        V = 3
        spec = get_codec_model("MCVC-IA", num_views=V)
        gop = jax.random.uniform(KEY, (3, V, 64, 64, 3))
        mask = jnp.asarray([1.0, 0.0, 1.0])  # middle view failed
        params = jax.jit(partial(spec.module.init, training=False))(
            {"params": KEY}, gop[:2], mask
        )
        streams, recon, bits = mcvc_compress_gop(spec, params, gop, mask)
        dec = mcvc_decompress_gop(spec, params, streams)
        np.testing.assert_allclose(np.asarray(dec), np.asarray(recon), atol=1e-5)
        assert bits > 0
        assert streams["mask"] == [1.0, 0.0, 1.0]


class TestRunWarm:
    """The jit-cache wrapper must discard the first execution per shape
    signature (with perturbed inputs so memoizers can't serve the warm
    result) and host-sync every real call — coder/video.py _run_warm."""

    def test_first_call_double_executes_with_perturbed_inputs(self):
        from fastvideocodec_tpu.coder import video as cv

        calls = []

        def fn(x):
            calls.append(np.asarray(x).copy())
            return x * 2.0

        x = jnp.arange(8.0) + 1.0
        key = ("test_run_warm", "a")
        cv._WARMED.discard((key, cv._shape_sig((x,))))
        out = cv._run_warm(fn, key, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 2.0)
        assert len(calls) == 2  # warm-up + real
        # warm-up inputs are perturbed: a result memoizer keyed on
        # (callable, args) cannot return the warm-up output for the real call
        assert not np.array_equal(calls[0], calls[1])

        # second call with the same shape signature: no warm-up
        y = jnp.arange(8.0) + 3.0
        out2 = cv._run_warm(fn, key, y)
        np.testing.assert_allclose(np.asarray(out2), np.asarray(y) * 2.0)
        assert len(calls) == 3

        # a new shape signature warms again
        z = jnp.arange(16.0) + 1.0
        cv._run_warm(fn, key, z)
        assert len(calls) == 5

    def test_non_float_and_scalar_args_pass_through_unperturbed(self):
        from fastvideocodec_tpu.coder import video as cv

        seen = {}

        def fn(x, n, flag):
            seen["n"], seen["flag"] = n, flag
            return x + n

        x = jnp.ones((4,), jnp.int32)  # integer array: not perturbable
        key = ("test_run_warm", "b")
        cv._WARMED.discard((key, cv._shape_sig((x, 3, True))))
        out = cv._run_warm(fn, key, x, 3, True)
        np.testing.assert_allclose(np.asarray(out), 4)
        assert seen["n"] == 3 and seen["flag"] is True


@pytest.mark.slow
class TestDvcRealBitstream:
    def test_encode_decode_identity(self):
        """DVC sequential-chain real bits (reference DVC/net.py:121-205):
        the decoder reconstructs from (I-frame, bitstreams) alone."""
        from fastvideocodec_tpu.coder.video import (
            dvc_compress_gop,
            dvc_decompress_gop,
        )
        from fastvideocodec_tpu.models import get_codec_model

        spec = get_codec_model("DVC")
        T, H, W = 3, 64, 64
        gop = jax.random.uniform(KEY, (T, H, W, 3))
        params = jax.jit(partial(spec.module.init, training=False))(
            {"params": KEY}, gop[0][None], gop[1][None]
        )
        streams, recon, bits = dvc_compress_gop(spec, params, gop)
        dec = dvc_decompress_gop(spec, params, gop[0], streams)
        assert bool(jnp.all(dec == recon))
        assert bits > 0
        assert recon.shape == (T - 1, H, W, 3)


@pytest.mark.slow
class TestBaseRealBitstream:
    @pytest.mark.parametrize("name", ["Base", "Base-EC", "Base-ER"])
    def test_encode_decode_identity(self, name):
        """Base-family real bits (reference models.py:1722-1806): the ER
        correction and EC feature correction are deterministic functions of
        the decoded symbols, so decode == encode recon holds exactly."""
        from fastvideocodec_tpu.coder.video import (
            base_compress_gop,
            base_decompress_gop,
        )
        from fastvideocodec_tpu.models import get_codec_model

        spec = get_codec_model(name)
        T, H, W = 3, 64, 64
        gop = jax.random.uniform(jax.random.fold_in(KEY, hash(name) % 97), (T, H, W, 3))
        params = jax.jit(partial(spec.module.init, training=False))(
            {"params": KEY}, gop[0][None], gop[1][None]
        )
        streams, recon, bits = base_compress_gop(spec, params, gop)
        dec = base_decompress_gop(spec, params, gop[0], streams)
        assert bool(jnp.all(dec == recon))
        assert bits > 0
        assert recon.shape == (T - 1, H, W, 3)
