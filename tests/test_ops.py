"""Unit tests for core ops vs torch CPU reference semantics.

These pin down the sampling/numerics details SURVEY.md §7 lists as "hard
parts": grid_sample border/align_corners behaviour, bilinear upsampling
variants, GDN math, quantization likelihoods.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from fastvideocodec_tpu import ops


def _rand(*shape, seed=0):
    rng = np.random.RandomState(seed)
    return rng.rand(*shape).astype(np.float32)


class TestFlowWarp:
    def _torch_warp(self, img_nchw, flow_nchw):
        # reference models.py:732-741
        t_img = torch.from_numpy(img_nchw)
        t_flow = torch.from_numpy(flow_nchw)
        B, _, H, W = t_flow.shape
        hor = torch.linspace(-1.0, 1.0, W).view(1, 1, 1, W).expand(B, -1, H, -1)
        ver = torch.linspace(-1.0, 1.0, H).view(1, 1, H, 1).expand(B, -1, -1, W)
        grid = torch.cat([hor, ver], 1)
        nflow = torch.cat(
            [t_flow[:, 0:1] / ((W - 1.0) / 2.0), t_flow[:, 1:2] / ((H - 1.0) / 2.0)], 1
        )
        out = F.grid_sample(
            t_img, (grid + nflow).permute(0, 2, 3, 1),
            mode="bilinear", padding_mode="border", align_corners=False,
        )
        return out.numpy()

    @pytest.mark.parametrize("shape", [(2, 3, 16, 24), (1, 3, 8, 8)])
    def test_matches_torch_grid_sample(self, shape):
        B, C, H, W = shape
        img = _rand(B, C, H, W, seed=1)
        flow = (_rand(B, 2, H, W, seed=2) - 0.5) * 6.0  # pixels
        want = self._torch_warp(img, flow)
        got = ops.flow_warp(
            jnp.asarray(img.transpose(0, 2, 3, 1)),
            jnp.asarray(flow.transpose(0, 2, 3, 1)),
        )
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), want, atol=2e-5
        )

    def test_zero_flow_offgrid_identity(self):
        img = _rand(1, 3, 12, 12, seed=3)
        got = ops.flow_warp(
            jnp.asarray(img.transpose(0, 2, 3, 1)), jnp.zeros((1, 12, 12, 2))
        )
        want = self._torch_warp(img, np.zeros((1, 2, 12, 12), np.float32))
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), want, atol=2e-5
        )


class TestUpsampling:
    def test_x2_align_false(self):
        x = _rand(2, 4, 5, 7, seed=4)
        want = F.interpolate(torch.from_numpy(x), scale_factor=2, mode="bilinear").numpy()
        got = ops.bilinear_upsample_x2(jnp.asarray(x.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), want, atol=2e-5
        )

    def test_x2_align_true(self):
        x = _rand(2, 4, 5, 7, seed=5)
        want = F.interpolate(
            torch.from_numpy(x), scale_factor=2, mode="bilinear", align_corners=True
        ).numpy()
        got = ops.bilinear_upsample_x2_ac(jnp.asarray(x.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), want, atol=2e-5
        )

    def test_avg_pool(self):
        x = _rand(2, 3, 8, 10, seed=6)
        want = F.avg_pool2d(torch.from_numpy(x), 2, 2).numpy()
        got = ops.avg_pool2(jnp.asarray(x.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), want, atol=1e-6
        )


class TestGDN:
    def test_forward_matches_reference_math(self):
        ch = 8
        x = _rand(2, ch, 6, 6, seed=7) - 0.5
        gdn = ops.GDN(channels=ch)
        params = gdn.init(jax.random.PRNGKey(0), jnp.zeros((1, 6, 6, ch)))
        got = gdn.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))

        # reference math (GDN.py:64-93) with the same (fresh-init) params
        pedestal = (2 ** -18) ** 2
        beta = np.sqrt(np.ones(ch) + pedestal)
        gamma = np.sqrt(0.1 * np.eye(ch) + pedestal)
        beta_e = np.maximum(beta, (1e-6 + pedestal) ** 0.5) ** 2 - pedestal
        gamma_e = np.maximum(gamma, 2 ** -18) ** 2 - pedestal
        norm = np.einsum("oi,bihw->bohw", gamma_e, x ** 2) + beta_e[None, :, None, None]
        want = x / np.sqrt(norm)
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), want, rtol=1e-5, atol=1e-6
        )

    def test_inverse(self):
        ch = 4
        x = _rand(1, 5, 5, ch, seed=8)
        gdn = ops.GDN(channels=ch)
        igdn = ops.GDN(channels=ch, inverse=True)
        p1 = gdn.init(jax.random.PRNGKey(0), x)
        p2 = igdn.init(jax.random.PRNGKey(0), x)
        y = gdn.apply(p1, jnp.asarray(x))
        z = igdn.apply(p2, y)
        # fresh init beta=1, gamma=0.1*eye -> near-inverse for small x
        assert np.abs(np.asarray(z) - x).max() < 0.2


class TestLikelihoods:
    def test_laplace_interval(self):
        x = np.linspace(-5, 5, 41).astype(np.float32)
        scale = np.full_like(x, 0.7)
        t = torch.distributions.laplace.Laplace(
            torch.zeros_like(torch.from_numpy(x)), torch.from_numpy(scale)
        )
        want = (t.cdf(torch.from_numpy(x) + 0.5) - t.cdf(torch.from_numpy(x) - 0.5)).numpy()
        got = ops.laplace_likelihood(jnp.asarray(x), jnp.asarray(scale))
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)

    def test_bits_estimate_clamps(self):
        p = jnp.asarray([1.0, 1e-20, 0.5])
        bits = ops.bits_estimate(p)
        # p=1 -> clamped at 0 (the -log(1+1e-5) is slightly negative);
        # p~0 -> -log(1e-5)/ln2 ~ 16.6 (the +1e-5 floor binds before the 50 clamp)
        expected = 0.0 + (-np.log(1e-20 + 1e-5) / np.log(2)) + (
            -np.log(0.5 + 1e-5) / np.log(2)
        )
        np.testing.assert_allclose(float(bits), expected, rtol=1e-5)

    def test_gaussian_likelihood_matches_normal(self):
        from scipy.stats import norm
        x = np.linspace(-3, 3, 25).astype(np.float32)
        scale, mean = 1.3, 0.2
        want = norm.cdf(x + 0.5, mean, scale) - norm.cdf(x - 0.5, mean, scale)
        got = ops.gaussian_likelihood(
            jnp.asarray(x), jnp.full_like(jnp.asarray(x), scale), mean
        )
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)

    def test_build_indexes_matches_compressai_rule(self):
        table = ops.scale_table()
        scales = jnp.asarray([0.01, 0.11, 0.5, 10.0, 300.0])
        idx = ops.build_indexes(scales, table)
        t = np.asarray(table)
        want = []
        for s in np.asarray(scales):
            s = max(s, t[0])
            want.append(int(63 - np.sum(s <= t[:-1])))
        np.testing.assert_array_equal(np.asarray(idx), want)


class TestQuantize:
    def test_ste_grad_is_identity(self):
        f = lambda x: jnp.sum(ops.quantize_ste(x) ** 2)
        g = jax.grad(f)(jnp.asarray([0.3, 1.7]))
        np.testing.assert_allclose(np.asarray(g), 2 * np.round([0.3, 1.7]), atol=1e-6)

    def test_noise_range(self):
        x = jnp.zeros((1000,))
        y = ops.quantize_noise(x, jax.random.PRNGKey(0))
        assert float(jnp.max(jnp.abs(y))) <= 0.5

    def test_lower_bound_grad(self):
        # grad passes when x>=bound or pushes up
        g = jax.grad(lambda x: ops.lower_bound(x, 1.0))(0.5)
        assert float(g) == 0.0
        g = jax.grad(lambda x: -ops.lower_bound(x, 1.0))(0.5)
        assert float(g) == -1.0
        g = jax.grad(lambda x: ops.lower_bound(x, 1.0))(2.0)
        assert float(g) == 1.0


class TestMSSSIM:
    def test_matches_pytorch_msssim_formula(self):
        # identical inputs -> 1.0
        x = jnp.asarray(_rand(1, 180, 180, 3, seed=9))
        val = ops.ms_ssim(x, x)
        assert abs(float(val) - 1.0) < 1e-5

    def test_degrades_with_noise(self):
        x = _rand(1, 180, 180, 3, seed=10)
        noisy = np.clip(x + 0.1 * (_rand(1, 180, 180, 3, seed=11) - 0.5), 0, 1)
        v1 = float(ops.ms_ssim(jnp.asarray(x), jnp.asarray(x)))
        v2 = float(ops.ms_ssim(jnp.asarray(x), jnp.asarray(noisy)))
        assert v2 < v1


class TestSSFVolume:
    def test_volume_shape_and_level0(self):
        x = jnp.asarray(_rand(1, 32, 32, 3, seed=12))
        # flat channel stack: level d at channels d*C..(d+1)*C — a 5-D
        # [B,H,W,D,C] tensor pays (8,128) trailing-dim tile padding on
        # TPU (~50x physical blowup at C=3; round-5 xprof)
        vol = ops.gaussian_volume(x, sigma0=1.5, num_levels=5)
        assert vol.shape == (1, 32, 32, 18)
        np.testing.assert_allclose(np.asarray(vol[..., 0:3]), np.asarray(x))

    def test_warp_volume_identity(self):
        x = jnp.asarray(_rand(1, 16, 16, 3, seed=13))
        vol = ops.gaussian_volume(x, sigma0=1.5, num_levels=3)
        flow = jnp.zeros((1, 16, 16, 2))
        scale = jnp.full((1, 16, 16, 1), -1.0)  # depth -1 -> level z=(0*4-1)/2
        out = ops.warp_volume(vol, flow, scale, num_levels=3)
        # scale=-1 maps to z=-0.5 clamped to 0 -> level 0 == x
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)

    def test_pyramid_s2d_identity_and_blend(self):
        """warp_volume_pyramid_s2d (the '-TPU' SSF prediction op): zero
        flow + scale pinned to level 0 returns the reference exactly;
        scale deep inside the blurred stack returns the upsampled
        half-res blend (a == 0)."""
        from fastvideocodec_tpu.ops.warp import (
            gaussian_volume,
            s2d_phase_mean,
            up2_to_s2d,
            warp_volume_pyramid_s2d,
        )

        ref = jnp.asarray(_rand(1, 8, 16, 12, seed=21))
        h = s2d_phase_mean(ref, 3)
        vol_half = gaussian_volume(h, 1.5, 4)
        mot0 = jnp.zeros((1, 8, 16, 12)).at[..., 8:12].set(-1.0)
        out0 = warp_volume_pyramid_s2d(ref, vol_half, mot0, 5)
        np.testing.assert_allclose(np.asarray(out0), np.asarray(ref), atol=1e-5)
        # scale at exactly level 1 of the half stack (z=2 -> z_h=1): the
        # output is the upsampled pure level-1 sample
        s_l1 = (2.0 * 2.0 + 1.0) / 6.0 - 1.0  # z=2 for D=6
        mot1 = jnp.zeros((1, 8, 16, 12)).at[..., 8:12].set(s_l1)
        out1 = warp_volume_pyramid_s2d(ref, vol_half, mot1, 5)
        want1 = up2_to_s2d(vol_half[..., 3:6])
        np.testing.assert_allclose(
            np.asarray(out1), np.asarray(want1), atol=1e-5
        )

    def test_up2_to_s2d_matches_composition(self):
        from fastvideocodec_tpu.ops.warp import up2_to_s2d

        x = jnp.asarray(_rand(2, 5, 7, 3, seed=22))
        got = up2_to_s2d(x)
        want = ops.space_to_depth(ops.bilinear_upsample_x2(x), 2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def test_s2d_phase_mean_matches_avg_pool(self):
        from fastvideocodec_tpu.ops.warp import s2d_phase_mean

        x = jnp.asarray(_rand(1, 8, 12, 3, seed=23))
        got = s2d_phase_mean(ops.space_to_depth(x, 2), 3)
        want = ops.avg_pool2(x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


class TestSpaceToDepth:
    def test_roundtrip_and_mse_invariance(self):
        x = jnp.asarray(_rand(2, 8, 12, 3, seed=17))
        y = jnp.asarray(_rand(2, 8, 12, 3, seed=18))
        xs = ops.space_to_depth(x, 2)
        assert xs.shape == (2, 4, 6, 12)
        np.testing.assert_array_equal(
            np.asarray(ops.depth_to_space(xs, 2)), np.asarray(x)
        )
        # s2d is a permutation: MSE in either domain is identical
        ms_full = float(jnp.mean((x - y) ** 2))
        ms_s2d = float(
            jnp.mean((ops.space_to_depth(x, 2) - ops.space_to_depth(y, 2)) ** 2)
        )
        assert abs(ms_full - ms_s2d) < 1e-7

    def test_phase_layout(self):
        # channel bands are (dy, dx) pixel phases of each 2x2 block
        x = jnp.arange(2 * 2 * 1, dtype=jnp.float32).reshape(1, 2, 2, 1)
        xs = ops.space_to_depth(x, 2)  # [1, 1, 1, 4]
        np.testing.assert_array_equal(
            np.asarray(xs).ravel(), np.array([0.0, 1.0, 2.0, 3.0])
        )
