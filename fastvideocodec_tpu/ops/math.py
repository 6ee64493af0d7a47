"""Quantization and rate-estimation math.

Replicates the numerics the reference relies on everywhere:
- additive-uniform-noise / round / straight-through quantization
  (reference models.py:603-622, 1307-1323; compressai quantize_ste),
- Laplace / Gaussian interval likelihoods with the exact clamps
  (reference models.py:1235-1239, entropy_models.py:61-63),
- bits-from-likelihood ``sum(clamp(-log(p+1e-5)/ln2, 0, 50))``
  (reference models.py:517, 274-277).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

LOG2 = math.log(2.0)

# compressai defaults, mirrored for RD parity.
SCALES_MIN = 0.11
SCALES_MAX = 256.0
SCALES_LEVELS = 64
LIKELIHOOD_LOWER_BOUND = 1e-9


def quantize_noise(x: jax.Array, rng: jax.Array) -> jax.Array:
    """Training-time quantization: additive U(-0.5, 0.5) noise."""
    return x + jax.random.uniform(rng, x.shape, x.dtype, -0.5, 0.5)


def quantize_ste(x: jax.Array) -> jax.Array:
    """Round with straight-through gradient (compressai quantize_ste)."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def quantize(x: jax.Array, training: bool, rng: jax.Array | None = None) -> jax.Array:
    """noise when training, hard round otherwise (reference models.py:603-609)."""
    if training:
        assert rng is not None, "training quantization needs an rng"
        return quantize_noise(x, rng)
    return jnp.round(x)


def laplace_cdf(x: jax.Array, scale: jax.Array) -> jax.Array:
    """CDF of Laplace(0, scale) evaluated at x."""
    # 0.5 * exp(x/b) for x<0 ; 1 - 0.5*exp(-x/b) for x>=0, expressed stably.
    return 0.5 - 0.5 * jnp.sign(x) * jnp.expm1(-jnp.abs(x) / scale)


def laplace_likelihood(x: jax.Array, scale: jax.Array) -> jax.Array:
    """P(x - 0.5 < X <= x + 0.5) under Laplace(0, scale).

    Scale is clamped to [1e-5, 1e10] exactly as the reference does before
    constructing the distribution (models.py:1236, 615).
    """
    scale = jnp.clip(scale, 1e-5, 1e10)
    return laplace_cdf(x + 0.5, scale) - laplace_cdf(x - 0.5, scale)


def gaussian_std_cdf(x: jax.Array) -> jax.Array:
    """Standard normal CDF via erfc, matching compressai's `_standardized_cumulative`."""
    return 0.5 * jax.lax.erfc(-(x) * (2 ** -0.5))


def gaussian_likelihood(
    x: jax.Array, scale: jax.Array, mean: jax.Array | None = None,
    scale_lower_bound: float = SCALES_MIN,
) -> jax.Array:
    """Interval likelihood under N(mean, scale^2) (compressai GaussianConditional).

    `scale` is lower-bounded at SCALES_MIN and the result at
    LIKELIHOOD_LOWER_BOUND, matching compressai defaults the reference
    inherits (entropy_models.py:38, models.py:1966).
    """
    if mean is not None:
        x = x - mean
    scale = lower_bound(scale, scale_lower_bound)
    x = jnp.abs(x)
    upper = gaussian_std_cdf((0.5 - x) / scale)
    lower = gaussian_std_cdf((-0.5 - x) / scale)
    return lower_bound(upper - lower, LIKELIHOOD_LOWER_BOUND)


@jax.custom_vjp
def lower_bound(x: jax.Array, bound) -> jax.Array:
    """max(x, bound) with the compressai LowerBound gradient:

    gradient passes when x >= bound OR when the incoming gradient pushes x
    up (grad < 0) — reference DVC/subnet/GDN.py:9-23.
    """
    return jnp.maximum(x, bound)


def _lower_bound_fwd(x, bound):
    return jnp.maximum(x, bound), (x, bound)


def _lower_bound_bwd(res, g):
    x, bound = res
    pass_through = (x >= bound) | (g < 0)
    return (jnp.where(pass_through, g, 0.0), None)


lower_bound.defvjp(_lower_bound_fwd, _lower_bound_bwd)


def bits_estimate(likelihoods: jax.Array) -> jax.Array:
    """sum(clamp(-log(p + 1e-5)/ln2, 0, 50)) — reference models.py:517."""
    return jnp.sum(jnp.clip(-jnp.log(likelihoods + 1e-5) / LOG2, 0.0, 50.0))


def bits_estimate_unclamped(likelihoods: jax.Array, axis=None) -> jax.Array:
    """-sum(log2 p), the variant MeanScaleHyperPriors uses (entropy_models.py:228-235)."""
    return -jnp.sum(jnp.log(likelihoods), axis=axis) / LOG2


def scale_table(
    min_: float = SCALES_MIN, max_: float = SCALES_MAX, levels: int = SCALES_LEVELS
):
    """exp-spaced scale table (reference entropy_models.py:18-23).

    Returns a host-side numpy array (it's a static constant — building it
    with jnp would capture a tracer when a module is constructed under jit).
    """
    import numpy as np

    return np.exp(np.linspace(math.log(min_), math.log(max_), levels))


def build_indexes(scales: jax.Array, table: jax.Array) -> jax.Array:
    """Bucket each scale into the scale table (compressai build_indexes).

    index = number of table entries (excluding the last) that are strictly
    below the lower-bounded scale.
    """
    scales = jnp.maximum(scales, table[0])
    # indexes = (len-1) - sum_{t in table[:-1]} [scales <= t]
    cmp = scales[..., None] <= table[:-1]
    return (table.shape[0] - 1 - jnp.sum(cmp, axis=-1)).astype(jnp.int32)


def psnr(x: jax.Array, y: jax.Array) -> jax.Array:
    """10*log10(1/mse) on [0,1] images (reference models.py:460-473)."""
    mse = jnp.mean((x.astype(jnp.float32) - y.astype(jnp.float32)) ** 2)
    return 10.0 * jnp.log(1.0 / mse) / jnp.log(10.0)
