"""Codec-family forward/backward tests at tiny sizes (the heavier whole-zoo
smoke lives in the TPU drive; these keep CI tractable on 1 CPU core)."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastvideocodec_tpu.gop import rollout
from fastvideocodec_tpu.models import get_codec_model, sample_view_mask
from fastvideocodec_tpu.train import TrainConfig, make_train_step

KEY = jax.random.PRNGKey(0)
H = W = 64
T = 4


def _init(spec, gop, mask=None):
    m = spec.module
    jinit = jax.jit(partial(m.init, training=False))
    if spec.family in ("dvc", "base"):
        return jinit({"params": KEY}, gop[1][None], gop[0][None])
    if spec.family == "rlvc":
        hidden = m.init_hidden(1, H, W)
        return jax.jit(partial(m.init, training=False))(
            {"params": KEY}, gop[0][None], gop[1][None], hidden, False
        )
    if spec.family == "lsvc":
        return jinit({"params": KEY}, gop)
    if spec.family in ("ssf", "elfvc"):
        return jinit({"params": KEY}, gop[:2, None])
    if spec.family == "mcvc":
        return jinit({"params": KEY}, gop[:2], mask)
    raise ValueError(spec.family)


class TestForward:
    @pytest.mark.parametrize("name", ["DVC", "RLVC2", "LSVC-128"])
    def test_rollout_shapes_and_finite(self, name):
        spec = get_codec_model(name)
        gop = jax.random.uniform(KEY, (T, H, W, 3))
        params = _init(spec, gop)
        x_hat, metrics = jax.jit(
            lambda p, g: rollout(spec, p, g, training=False, rng=None)
        )(params, gop)
        assert x_hat.shape[0] == T - 1
        assert np.isfinite(np.asarray(metrics["psnr"])).all()
        bpp = np.asarray(metrics.get("bpp_est", metrics.get("bpp")))
        assert (bpp > 0).all()

    def test_lsvc_uses_tree_not_chain(self):
        spec = get_codec_model("LSVC-128")
        sched = spec.module.schedule(15)
        assert sched.depth == 4  # log-depth, not 15

    def test_mcvc_resilience_masking(self):
        spec = get_codec_model("MCVC-IA", num_views=4, resilience=2)
        V = 4
        gop = jax.random.uniform(KEY, (T, V, H, W, 3))
        mask = jnp.asarray([1.0, 0.0, 1.0, 1.0])  # view 1 failed
        params = _init(spec, gop, mask)
        x_hat, metrics = jax.jit(
            lambda p, g, mk: rollout(spec, p, g, training=False, rng=None, mask=mk)
        )(params, gop, mask)
        assert x_hat.shape == gop.shape
        assert np.isfinite(np.asarray(metrics["psnr"])).all()

    def test_view_mask_sampler(self):
        rng = np.random.default_rng(0)
        m = sample_view_mask(rng, batch=2, num_views=4, max_failed=2,
                             force_resilience=1)
        assert m.shape == (8,)
        assert m[:4].sum() == 3  # exactly one view failed
        np.testing.assert_array_equal(m[:4], m[4:])  # same failure per replica


class TestTraining:
    def test_dvc_train_step_reduces_nothing_but_runs(self):
        spec = get_codec_model("DVC", compression_level=2)
        gop = jax.random.uniform(KEY, (T, H, W, 3))
        params = _init(spec, gop)
        cfg = TrainConfig(learning_rate=1e-4)
        init_fn, step_fn = make_train_step(spec, cfg)
        opt_state = init_fn(params)
        jstep = jax.jit(step_fn)
        p2, o2, metrics = jstep(params, opt_state, gop, KEY)
        assert np.isfinite(float(metrics["loss"]))
        assert float(metrics["grad_norm"]) > 0
        # params actually moved
        diff = jax.tree_util.tree_reduce(
            lambda a, b: a + float(jnp.abs(b).sum()),
            jax.tree.map(lambda a, b: a - b, params, p2), 0.0,
        )
        assert diff > 0

    def test_elfvc_sp_aux_losses_present(self):
        spec = get_codec_model("ELFVC-SP")
        gop = jax.random.uniform(KEY, (3, H, W, 3))
        params = _init(spec, gop)
        x_hat, metrics = jax.jit(
            lambda p, g: rollout(spec, p, g, training=True, rng=KEY)
        )(params, gop)
        assert "pred_err_norm" in metrics
        assert np.isfinite(np.asarray(metrics["pred_err_norm"])).all()
