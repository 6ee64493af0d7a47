"""torch -> flax DVC checkpoint conversion (reference snapshots,
models.py:1438-1444): layout parity against torch CPU ops and full-tree
structural compatibility with models.DVC."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from fastvideocodec_tpu.utils.torch_import import (
    _conv_w,
    _deconv_w,
    _deconv_w_as_conv,
    convert_dvc_state_dict,
)

KEY = jax.random.PRNGKey(0)

# layer-parity assertions are exact math checks; CPU's default fast matmul
# precision adds ~3e-3 noise that would mask real layout bugs
jax.config.update("jax_default_matmul_precision", "highest")


class TestLayerParity:
    def test_conv2d_mapping(self):
        t = torch.nn.Conv2d(4, 6, 5, stride=2, padding=2)
        x = torch.randn(1, 4, 16, 16)
        want = t(x).detach().numpy()

        from flax import linen as nn

        m = nn.Conv(6, (5, 5), strides=(2, 2), padding=2)
        params = {
            "params": {
                "kernel": jnp.asarray(_conv_w(t.weight.detach().numpy())),
                "bias": jnp.asarray(t.bias.detach().numpy()),
            }
        }
        got = m.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), want, atol=1e-5
        )

    def test_conv_transpose_stride2_mapping(self):
        """torch ConvTranspose2d(k, s=2, p=k//2, op=1) == PolyphaseDeconv
        with the [I,O,kh,kw] -> [kh,kw,I,O] kernel transform."""
        from fastvideocodec_tpu.layers.transforms import PolyphaseDeconv

        for k in (3, 5):
            t = torch.nn.ConvTranspose2d(4, 6, k, stride=2, padding=k // 2,
                                         output_padding=1)
            x = torch.randn(1, 4, 8, 8)
            want = t(x).detach().numpy()

            m = PolyphaseDeconv(6, kernel_size=k)
            params = {
                "params": {
                    "kernel": jnp.asarray(_deconv_w(t.weight.detach().numpy())),
                    "bias": jnp.asarray(t.bias.detach().numpy()),
                }
            }
            got = m.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
            np.testing.assert_allclose(
                np.asarray(got).transpose(0, 3, 1, 2), want, atol=1e-5,
                err_msg=f"k={k}",
            )

    def test_conv_transpose_stride1_is_flipped_conv(self):
        """respriorDecoder.deconv3 (stride-1 ConvTranspose2d) == plain conv
        with the spatially flipped kernel."""
        t = torch.nn.ConvTranspose2d(4, 6, 3, stride=1, padding=1)
        x = torch.randn(1, 4, 8, 8)
        want = t(x).detach().numpy()

        from flax import linen as nn

        m = nn.Conv(6, (3, 3), padding=1)
        params = {
            "params": {
                "kernel": jnp.asarray(
                    _deconv_w_as_conv(t.weight.detach().numpy()).copy()
                ),
                "bias": jnp.asarray(t.bias.detach().numpy()),
            }
        }
        got = m.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), want, atol=1e-5
        )


def _synthetic_dvc_state_dict():
    """A reference-shaped VideoCompressor state dict (DVC/net.py:39-56
    module names) with random values."""
    rng = np.random.RandomState(0)
    sd = {}

    def conv(name, i, o, k):
        sd[f"{name}.weight"] = rng.randn(o, i, k, k).astype(np.float32) * 0.05
        sd[f"{name}.bias"] = rng.randn(o).astype(np.float32) * 0.01

    def deconv(name, i, o, k):
        sd[f"{name}.weight"] = rng.randn(i, o, k, k).astype(np.float32) * 0.05
        sd[f"{name}.bias"] = rng.randn(o).astype(np.float32) * 0.01

    def gdn(name, ch):
        sd[f"{name}.beta"] = np.sqrt(np.ones(ch, np.float32) + 2 ** -36)
        sd[f"{name}.gamma"] = np.sqrt(
            0.1 * np.eye(ch, dtype=np.float32) + 2 ** -36
        )

    MV, N, M = 128, 64, 96
    # SpyNet: 4 levels x 5 convs (8 -> 32 -> 64 -> 32 -> 16 -> 2, 7x7)
    for L in range(4):
        dims = [8, 32, 64, 32, 16, 2]
        for j in range(1, 6):
            conv(f"opticFlow.moduleBasic.{L}.conv{j}", dims[j - 1], dims[j], 7)
    # mvEncoder: 2 -> 128 x8 3x3
    dims = [2] + [MV] * 8
    for j in range(1, 9):
        conv(f"mvEncoder.conv{j}", dims[j - 1], dims[j], 3)
    # mvDecoder: 8 layers, odd transposed (128 -> ... -> 2)
    for j in range(1, 8):
        if j % 2 == 1:
            deconv(f"mvDecoder.deconv{j}", MV, MV, 3)
        else:
            conv(f"mvDecoder.deconv{j}", MV, MV, 3)
    conv("mvDecoder.deconv8", MV, 2, 3)
    # warpnet: 6ch input, width 64
    conv("warpnet.feature_ext", 6, 64, 3)
    for i in range(6):
        conv(f"warpnet.conv{i}.conv1", 64, 64, 3)
        conv(f"warpnet.conv{i}.conv2", 64, 64, 3)
    conv("warpnet.conv6", 64, 3, 3)
    # resEncoder 3 -> 64 -> 64 -> 64 -> 96 (5x5 s2) + gdn
    dims = [3, N, N, N, M]
    for j in range(1, 5):
        conv(f"resEncoder.conv{j}", dims[j - 1], dims[j], 5)
    for j in range(1, 4):
        gdn(f"resEncoder.gdn{j}", N)
    # resDecoder 96 -> 64 x3 -> 3 (5x5 s2 transposed) + igdn
    dims = [M, N, N, N, 3]
    for j in range(1, 5):
        deconv(f"resDecoder.deconv{j}", dims[j - 1], dims[j], 5)
    for j in range(1, 4):
        gdn(f"resDecoder.igdn{j}", N)
    # respriorEncoder 96 -> 64 (3x3 s1) -> 64 -> 64 (5x5 s2)
    conv("respriorEncoder.conv1", M, N, 3)
    conv("respriorEncoder.conv2", N, N, 5)
    conv("respriorEncoder.conv3", N, N, 5)
    # respriorDecoder 64 -> 64 -> 64 (5x5 s2 transposed), -> 96 (3x3 s1 transposed)
    deconv("respriorDecoder.deconv1", N, N, 5)
    deconv("respriorDecoder.deconv2", N, N, 5)
    deconv("respriorDecoder.deconv3", N, M, 3)
    # bit estimators
    for name, ch in (("bitEstimator_z", N), ("bitEstimator_mv", MV)):
        for j in range(1, 5):
            for p in ("h", "b") + (("a",) if j < 4 else ()):
                sd[f"{name}.f{j}.{p}"] = (
                    rng.randn(1, ch, 1, 1).astype(np.float32) * 0.01
                )
    return sd


class TestFullConversion:
    @pytest.mark.slow
    def test_tree_structure_matches_dvc_init_and_runs(self):
        from fastvideocodec_tpu.models import get_codec_model

        sd = _synthetic_dvc_state_dict()
        converted = convert_dvc_state_dict(sd)

        spec = get_codec_model("DVC")
        x = jax.random.uniform(KEY, (1, 64, 64, 3))
        init = jax.jit(partial(spec.module.init, training=False))(
            {"params": KEY}, x, x
        )

        # exact same tree: paths AND shapes
        init_paths = {
            tuple(str(getattr(k, "key", k)) for k in p): v.shape
            for p, v in jax.tree_util.tree_flatten_with_path(init)[0]
        }
        conv_paths = {
            tuple(str(getattr(k, "key", k)) for k in p): np.shape(v)
            for p, v in jax.tree_util.tree_flatten_with_path(converted)[0]
        }
        assert conv_paths == init_paths, (
            set(init_paths) ^ set(conv_paths)
            or {k for k in init_paths if init_paths[k] != conv_paths[k]}
        )

        # and the model runs on the converted weights
        converted = jax.tree_util.tree_map(jnp.asarray, converted)
        x_rec, metrics = spec.module.apply(converted, x, x, training=False)
        assert np.isfinite(np.asarray(x_rec)).all()
        assert np.isfinite(float(metrics["bpp_est"]))

    def test_unmapped_keys_raise(self):
        sd = _synthetic_dvc_state_dict()
        sd["mystery.weight"] = np.zeros((1,), np.float32)
        try:
            convert_dvc_state_dict(sd)
        except KeyError as e:
            assert "mystery.weight" in str(e)
        else:
            raise AssertionError("expected KeyError for unmapped key")
