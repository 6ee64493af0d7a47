"""Learned factorized CDF ("BitEstimator") — reference DVC/subnet/bitEstimator.py.

A 4-layer monotone per-channel net F(x); symbol probability is
p = F(x + 0.5) - F(x - 0.5). Used by LSVC / Base / RLVC2 for z and mv rates.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class Bitparm(nn.Module):
    """One monotone layer: x*softplus(h)+b (+ tanh(x)*tanh(a) if not final)."""

    channels: int
    final: bool = False

    @nn.compact
    def __call__(self, x):
        init = nn.initializers.normal(stddev=0.01)
        h = self.param("h", init, (self.channels,))
        b = self.param("b", init, (self.channels,))
        x = x * jax.nn.softplus(h) + b
        if self.final:
            return jax.nn.sigmoid(x)
        a = self.param("a", init, (self.channels,))
        return x + jnp.tanh(x) * jnp.tanh(a)


class BitEstimator(nn.Module):
    """F(x) for x [..., C]; channels broadcast over leading axes."""

    channels: int

    def setup(self):
        self.f1 = Bitparm(self.channels)
        self.f2 = Bitparm(self.channels)
        self.f3 = Bitparm(self.channels)
        self.f4 = Bitparm(self.channels, final=True)

    def __call__(self, x):
        return self.f4(self.f3(self.f2(self.f1(x))))

    def likelihood(self, x):
        """p = F(x+0.5) - F(x-0.5) (reference models.py:1264, 619)."""
        return self(x + 0.5) - self(x - 0.5)
