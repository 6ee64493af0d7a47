"""Pure-JAX MS-SSIM (NHWC), matching pytorch_msssim defaults.

The reference uses `pytorch_msssim.ms_ssim` as metric and MS-SSIM loss
(models.py:475-487) with default settings: data_range=1, win_size=11,
win_sigma=1.5, weights [0.0448, 0.2856, 0.3001, 0.2363, 0.1333], K=(0.01,
0.03), gaussian window, avg-pool (kernel 2) between scales.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _fspecial_gauss_1d(size: int, sigma: float) -> np.ndarray:
    coords = np.arange(size, dtype=np.float64) - size // 2
    g = np.exp(-(coords ** 2) / (2 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


def _gaussian_filter(x: jax.Array, win: jax.Array) -> jax.Array:
    """Separable depthwise gaussian filter, VALID padding (pytorch_msssim)."""
    B, H, W, C = x.shape
    k = win.shape[0]
    kh = jnp.broadcast_to(win.reshape(k, 1, 1, 1), (k, 1, 1, C)).astype(x.dtype)
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C,
    )
    kw = jnp.broadcast_to(win.reshape(1, k, 1, 1), (1, k, 1, C)).astype(x.dtype)
    return jax.lax.conv_general_dilated(
        x, kw, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C,
    )


def _ssim(x, y, win, data_range=1.0, k1=0.01, k2=0.03):
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    mu1 = _gaussian_filter(x, win)
    mu2 = _gaussian_filter(y, win)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _gaussian_filter(x * x, win) - mu1_sq
    sigma2_sq = _gaussian_filter(y * y, win) - mu2_sq
    sigma12 = _gaussian_filter(x * y, win) - mu1_mu2

    cs_map = (2 * sigma12 + c2) / (sigma1_sq + sigma2_sq + c2)
    ssim_map = ((2 * mu1_mu2 + c1) / (mu1_sq + mu2_sq + c1)) * cs_map
    return ssim_map.mean(axis=(1, 2, 3)), cs_map.mean(axis=(1, 2, 3))


def _avg_pool2_pad(x: jax.Array) -> jax.Array:
    B, H, W, C = x.shape
    if H % 2 or W % 2:
        x = jnp.pad(x, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
        B, H, W, C = x.shape
    return x.reshape(B, H // 2, 2, W // 2, 2, C).mean(axis=(2, 4))


def ms_ssim(
    x: jax.Array,
    y: jax.Array,
    data_range: float = 1.0,
    win_size: int = 11,
    win_sigma: float = 1.5,
    weights=_WEIGHTS,
) -> jax.Array:
    """Multi-scale SSIM over NHWC batches; returns per-batch scalar mean."""
    levels = len(weights)
    min_side = (win_size - 1) * 2 ** (levels - 1)
    if min(x.shape[1], x.shape[2]) <= min_side:
        raise ValueError(
            f"ms_ssim needs H and W > {min_side} for win_size={win_size} "
            f"and {levels} scales (pytorch_msssim has the same constraint); "
            f"got {x.shape[1]}x{x.shape[2]}"
        )
    win = jnp.asarray(_fspecial_gauss_1d(win_size, win_sigma))
    mcs = []
    ssim_val = None
    for i in range(levels):
        ssim_val, cs = _ssim(x, y, win, data_range)
        if i < levels - 1:
            mcs.append(jnp.maximum(cs, 0.0))
            x = _avg_pool2_pad(x)
            y = _avg_pool2_pad(y)
    ssim_val = jnp.maximum(ssim_val, 0.0)
    w = jnp.asarray(weights)
    stacked = jnp.stack(mcs + [ssim_val], axis=0)  # [levels, B]
    return jnp.prod(stacked ** w[:, None], axis=0).mean()


def msssim_db(x: jax.Array, y: jax.Array) -> jax.Array:
    """-10*log10(1 - msssim), the reference's MS-SSIM 'quality' (models.py:480)."""
    q = ms_ssim(x, y)
    return -10.0 * jnp.log(1.0 - q) / jnp.log(10.0)
