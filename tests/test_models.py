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
    @pytest.mark.parametrize(
        "name",
        [
            "DVC",
            pytest.param("RLVC2", marks=pytest.mark.slow),
            pytest.param("LSVC-128", marks=pytest.mark.slow),
            "LSVC-TPU",
        ],
    )
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

    @pytest.mark.slow
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
    pytestmark = pytest.mark.slow  # full train-step compiles, >1 min each

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


class TestStagedTraining:
    """VERDICT round-1 item 5: the ELFVC spstage optimizer groups
    (reference optim_parameters models.py:2026-2078) and the Base-ER
    soft2hard three-pass schedule (models.py:318-344)."""

    pytestmark = pytest.mark.slow  # staged train-step compiles dominate

    @pytest.mark.parametrize("sp_stage", [0, 1, 2])
    def test_elfvc_stage_only_updates_stage_groups(self, sp_stage):
        """Pure optimizer-masking check with well-conditioned gradients:
        the stage's parameter groups get nonzero updates, everything else
        exactly zero. (A full train step at random init is numerically
        degenerate — the untrained SPnet's GroupNorm over near-constant
        round(y) inputs explodes the global grad norm to ~1e30, and
        clip_by_global_norm then underflows every update — so the masking
        is asserted on synthetic unit gradients.)"""
        from fastvideocodec_tpu.train import (
            elfvc_stage_trainable,
            make_elfvc_stage_optimizer,
        )

        spec = get_codec_model("ELFVC-SP", sp_stage=1)
        gop = jax.random.uniform(KEY, (T, 1, H, W, 3))
        params = _init(spec, gop[:, 0])
        cfg = TrainConfig(learning_rate=1e-3)
        tx = make_elfvc_stage_optimizer(cfg, sp_stage)
        grads = jax.tree_util.tree_map(jnp.ones_like, params)
        updates, _ = jax.jit(tx.update)(grads, tx.init(params), params)

        trainable = elfvc_stage_trainable(sp_stage)
        moved, frozen_moved = 0.0, 0.0
        for path, u in jax.tree_util.tree_flatten_with_path(updates)[0]:
            d = float(jnp.abs(u).sum())
            if trainable(path):
                moved += d
            else:
                frozen_moved += d
        assert moved > 0
        assert frozen_moved == 0.0

    def test_elfvc_stage1_train_step_runs(self):
        from fastvideocodec_tpu.train import make_elfvc_stage_optimizer

        spec = get_codec_model("ELFVC-SP", sp_stage=1)
        gop = jax.random.uniform(KEY, (T, 1, H, W, 3))
        params = _init(spec, gop[:, 0])
        cfg = TrainConfig(learning_rate=1e-3)
        tx = make_elfvc_stage_optimizer(cfg, 1)
        init_fn, step_fn = make_train_step(spec, cfg, optimizer=tx)
        p2, _, metrics = jax.jit(step_fn)(params, init_fn(params), gop, KEY)
        assert np.isfinite(float(metrics["loss"]))

    def test_base_er_soft2hard_three_pass(self):
        from fastvideocodec_tpu.train import gop_loss

        spec = get_codec_model("Base-ER")
        gop = jax.random.uniform(KEY, (T, H, W, 3))
        params = _init(spec, gop)
        cfg_soft = TrainConfig(soft2hard=False)
        cfg_s2h = TrainConfig(soft2hard=True)
        l_soft, _ = jax.jit(
            lambda p, g, r: gop_loss(spec, p, g, True, r, cfg_soft)
        )(params, gop, KEY)
        l_s2h, m = jax.jit(
            lambda p, g, r: gop_loss(spec, p, g, True, r, cfg_s2h)
        )(params, gop, KEY)
        # the three-pass average runs the hard decode paths: loss differs
        # from the single soft pass and stays finite
        assert np.isfinite(float(l_s2h))
        assert abs(float(l_s2h) - float(l_soft)) > 1e-8
        # and ER pred_err contributes to both (err[1] term)
        assert float(m["loss"]) == float(l_s2h)

    def test_spnet_finite_grads_on_constant_input(self):
        """Regression: WSConvBlock's bias must not be zero-init.

        SPnet's first-frame inputs are structurally zero at random init
        (q_y_prior = 0, round(y - mu) = 0); with a zeros bias every conv
        output is exactly constant, GroupNorm sees var = 0 and each block
        amplifies gradients by rsqrt(eps) ~ 1e3, overflowing to inf through
        the stacked towers — clip_by_global_norm then silently zeroes all
        ELFVC-SP updates (the reference never hits this: torch Conv2d bias
        init is uniform)."""
        from fastvideocodec_tpu.layers.blocks import SPnet

        net = SPnet(output_channels=24, dim=16)
        x = jnp.zeros((1, 8, 8, 48))
        params = jax.jit(net.init)(KEY, x)

        def loss(p):
            return jnp.sum(jnp.abs(net.apply(p, x)))

        g = jax.jit(jax.grad(loss))(params)
        norms = [
            float(jnp.linalg.norm(v.astype(jnp.float32)))
            for v in jax.tree_util.tree_leaves(g)
        ]
        assert all(np.isfinite(n) for n in norms), norms


class TestCodecNet:
    """Config-list-driven conv-stack builder (reference CodecNet,
    models.py:1492-1546)."""

    def test_mixed_config_shapes(self):
        from fastvideocodec_tpu.layers import CodecNet

        cfgs = (
            (0, 5, 2, 6, 16), 2,            # conv s2 + relu
            (8, 3, 2, 16, 24),              # strided basic block
            (11, 1, 1, 24, 24),             # conv attention
            (13, 3, 1, 24, 24),             # residual block
            (4, 1, 1, 24, 24),              # GDN
            (1, 5, 2, 24, 16), 3,           # deconv s2 + lrelu
            (5, 1, 1, 16, 16),              # IGDN
            (1, 5, 2, 16, 8), 7,            # deconv s2 + tanh
            (10, 2, 2, 8, 8),               # avg pool
        )
        net = CodecNet(cfgs)
        x = jnp.ones((1, 32, 32, 6))
        params = jax.jit(net.init)(KEY, x)
        y = jax.jit(net.apply)(params, x)
        # 32 /2 /2 *2 *2 /2(pool) = 16
        assert y.shape == (1, 16, 16, 8)
        assert bool(jnp.all(jnp.isfinite(y)))

    def test_er_config_matches_reference_topology(self):
        """er_gen_config builds the 4-conv LeakyReLU ER stack
        (models.py:1587-1589) with the reference's xavier(sqrt 2)/0.01
        init."""
        from fastvideocodec_tpu.layers import CodecNet, er_gen_config

        net = CodecNet(er_gen_config(8, 16))
        x = jnp.ones((2, 8, 8, 8))
        params = jax.jit(net.init)(KEY, x)
        y = net.apply(params, x)
        assert y.shape == (2, 8, 8, 8)
        p = params["params"]
        convs = sorted(k for k in p if k.startswith("conv_"))
        assert len(convs) == 4
        # bias constant 0.01 (models.py:1543)
        assert bool(jnp.all(p[convs[0]]["bias"] == 0.01))
        # xavier-normal gain sqrt(2): std = sqrt(2/fan_avg)
        w = p[convs[1]]["kernel"]  # [5,5,16,16]
        fan_avg = 5 * 5 * 16
        expect = np.sqrt(2.0 / fan_avg)
        assert abs(float(jnp.std(w)) - expect) / expect < 0.15

    def test_channel_mismatch_asserts(self):
        from fastvideocodec_tpu.layers import CodecNet

        net = CodecNet(((0, 3, 1, 4, 8),))
        with pytest.raises(AssertionError):
            net.init(KEY, jnp.ones((1, 8, 8, 3)))


class TestFusedDeconvAct:
    """PolyphaseDeconv.act applies bias+activation BEFORE the d2s permute —
    must be element-for-element identical to post-activation (it's the
    same values in a different order; transforms.py PolyphaseDeconv)."""

    def test_bitwise_equal_to_post_activation(self):
        from fastvideocodec_tpu.layers.transforms import (
            PolyphaseDeconv,
            leaky01,
        )

        x = jax.random.normal(KEY, (2, 8, 12, 16))
        m0 = PolyphaseDeconv(24, kernel_size=3)
        m1 = PolyphaseDeconv(24, kernel_size=3, act=leaky01)
        params = m0.init(KEY, x)  # same param structure for both
        y0 = leaky01(m0.apply(params, x))
        y1 = m1.apply(params, x)
        assert bool(jnp.all(y0 == y1))

    def test_grad_matches(self):
        from fastvideocodec_tpu.layers.transforms import (
            PolyphaseDeconv,
            leaky01,
        )

        x = jax.random.normal(KEY, (1, 6, 6, 8))
        m0 = PolyphaseDeconv(4, kernel_size=5)
        m1 = PolyphaseDeconv(4, kernel_size=5, act=leaky01)
        params = m0.init(KEY, x)
        g0 = jax.grad(lambda p: jnp.sum(leaky01(m0.apply(p, x)) ** 2))(params)
        g1 = jax.grad(lambda p: jnp.sum(m1.apply(p, x) ** 2))(params)
        for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.slow
class TestSpyNetS2DLevels:
    """spynet_s2d_levels: the finest towers run in the s2d domain with a
    polyphase full-res flow output (layers/spynet.py). Opt-in; 0 keeps the
    reference geometry and torch weight import intact."""

    def test_shapes_and_grads(self):
        from fastvideocodec_tpu.layers.spynet import SpyNet

        net = SpyNet(widths=(4, 8, 4, 4), kernel=3, s2d_levels=2)
        im1 = jax.random.uniform(KEY, (2, 32, 32, 3))
        im2 = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
        params = jax.jit(net.init)(KEY, im1, im2)
        flow = net.apply(params, im1, im2)
        assert flow.shape == (2, 32, 32, 2)
        # the two finest levels carry the 8-channel polyphase output conv
        p = params["params"]
        assert p["level4"]["Conv_4"]["kernel"].shape[-1] == 8
        assert p["level3"]["Conv_4"]["kernel"].shape[-1] == 8
        assert p["level2"]["Conv_4"]["kernel"].shape[-1] == 2
        g = jax.grad(
            lambda pr: jnp.sum(net.apply(pr, im1, im2) ** 2)
        )(params)
        assert all(
            bool(jnp.all(jnp.isfinite(l))) for l in jax.tree_util.tree_leaves(g)
        )

    def test_zero_levels_unchanged_geometry(self):
        from fastvideocodec_tpu.layers.spynet import SpyNet

        net = SpyNet(widths=(4, 8, 4, 4), kernel=3)
        im = jax.random.uniform(KEY, (1, 32, 32, 3))
        params = jax.jit(net.init)(KEY, im, im)
        p = params["params"]
        for lvl in range(1, 5):
            assert p[f"level{lvl}"]["Conv_4"]["kernel"].shape[-1] == 2


class TestMVPolyphaseOut:
    """SynthesisMVNet.polyphase_out folds the last spatial doubling into
    the output conv (4*out channels + d2s) — full-res output from a stack
    whose trunk never runs at full resolution (transforms.py)."""

    def test_shape_and_grads(self):
        from fastvideocodec_tpu.layers.transforms import SynthesisMVNet

        net = SynthesisMVNet(conv_channels=8, stages=3, polyphase_out=True)
        x = jax.random.normal(KEY, (2, 4, 6, 8))
        params = jax.jit(net.init)(KEY, x)
        y = net.apply(params, x)
        assert y.shape == (2, 32, 48, 2)  # 3 stride-2 ups from /8
        # final conv emits 2x2x2 polyphase channels
        convs = [k for k in params["params"] if k.startswith("Conv_")]
        last = sorted(convs)[-1]
        assert params["params"][last]["kernel"].shape[-1] == 8
        g = jax.grad(lambda p: jnp.sum(net.apply(p, x) ** 2))(params)
        assert all(
            bool(jnp.all(jnp.isfinite(l))) for l in jax.tree_util.tree_leaves(g)
        )

    def test_polyphase_positions_match_d2s_contract(self):
        """Each output 2x2 block comes from one low-res position's 8
        channels in (sy, sx, c) order — the PolyphaseDeconv/d2s layout."""
        from fastvideocodec_tpu.layers.transforms import SynthesisMVNet

        net = SynthesisMVNet(conv_channels=4, stages=1, polyphase_out=True)
        x = jax.random.normal(KEY, (1, 3, 5, 4))
        params = jax.jit(net.init)(KEY, x)
        y = net.apply(params, x)
        assert y.shape == (1, 6, 10, 2)
        # recompute the final conv by hand and d2s it
        import flax.linen as fnn

        # stages=1 -> ups == [True], trimmed to [] -> input goes straight
        # to the output conv
        conv = fnn.Conv(8, (3, 3), padding=1)
        raw = conv.apply({"params": params["params"]["Conv_0"]}, x)
        blk = raw.reshape(1, 3, 5, 2, 2, 2).transpose(0, 1, 3, 2, 4, 5)
        manual = blk.reshape(1, 6, 10, 2)
        np.testing.assert_allclose(np.asarray(y), np.asarray(manual), atol=1e-6)


class TestFullResWarp:
    """'-F' flag: full-resolution MC warp inside the s2d-domain flagship
    (models/lsvc.py full_res_warp; reference warp semantics
    models.py:730-752). The round-3 advisor flagged that no test covered
    the d2s -> warp -> s2d round trip or the registry flag."""

    def test_registry_flag_uniform_across_scales(self):
        # round-4 default: full-res warp + decoder-native full-res flow
        # ('-F'/'-F2' are aliases of the default; '-RW' = rigid s2d warp,
        # '-HF' = bilinearly-upsampled half-res flow)
        for nm in ("LSVC-TPU", "LSVC-TPU-TINY", "LSVC-TPU-F2",
                   "LSVC-TPU-TINY-F2"):
            m = get_codec_model(nm).module
            assert m.full_res_warp and m.mv_full_res_out, nm
        for nm in ("LSVC-TPU-HF", "LSVC-TPU-TINY-HF"):
            m = get_codec_model(nm).module
            assert m.full_res_warp and not m.mv_full_res_out, nm
        for nm in ("LSVC-TPU-RW", "LSVC-TPU-TINY-RW"):
            m = get_codec_model(nm).module
            assert not m.full_res_warp and not m.mv_full_res_out, nm

    def test_mc_warp_equals_fullres_roundtrip(self):
        from fastvideocodec_tpu.ops import (
            bilinear_upsample_x2,
            depth_to_space,
            flow_warp,
            space_to_depth,
        )

        spec = get_codec_model("LSVC-TPU-TINY-HF")
        m = spec.module
        gop = jax.random.uniform(KEY, (T, H, W, 3))
        params = _init(spec, gop)
        ref = space_to_depth(gop[:1], 2)  # [1, H/2, W/2, 12]
        mv = 2.5 * jax.random.normal(
            jax.random.PRNGKey(7), (1, H // 2, W // 2, 2)
        )

        def mc(mod, r, d):
            return mod.motioncompensation(r, d)

        _, warped = jax.jit(partial(m.apply, method=mc))(params, ref, mv)
        r = m.mc_displacement
        expect = space_to_depth(
            flow_warp(
                depth_to_space(ref, 2),
                2.0 * bilinear_upsample_x2(mv),
                max_displacement=2 * r,
            ),
            2,
        )
        np.testing.assert_allclose(
            np.asarray(warped), np.asarray(expect), atol=1e-6
        )
        # and the '-RW' ablation moves rigid 2x2 blocks instead (s2d warp)
        plain = get_codec_model("LSVC-TPU-TINY-RW")
        pparams = _init(plain, gop)
        _, warped_s2d = jax.jit(partial(plain.module.apply, method=mc))(
            pparams, ref, mv
        )
        s2d_expect = flow_warp(ref, mv, max_displacement=r)
        np.testing.assert_allclose(
            np.asarray(warped_s2d), np.asarray(s2d_expect), atol=1e-6
        )
