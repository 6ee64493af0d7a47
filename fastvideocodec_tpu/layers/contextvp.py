"""Context-based view prediction transformer (ContextVP / VPCT).

Reference super_precision.py:250-444: a GPT-style causal transformer over a
(view, h, w) token grid with the Entroformer shift-token trick — each token
predicts the next token's latent from the causal prefix, so surviving
views' latents can predict failed views'. The reference defines and imports
this (models.py:2126) but never wires it into an active forward; we keep it
as the same library capability.

TPU notes: one fused attention einsum per block, causal mask via iota
comparison (no O(T^2) buffer materialization outside the softmax)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class CausalSelfAttention(nn.Module):
    n_embd: int
    n_head: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, T, C = x.shape
        qkv = nn.Dense(3 * self.n_embd, dtype=self.dtype)(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = self.n_embd // self.n_head

        def heads(t):
            return t.reshape(B, T, self.n_head, hd)

        q, k, v = heads(q), heads(k), heads(v)
        att = jnp.einsum("bihd,bjhd->bhij", q, k) / jnp.sqrt(float(hd))
        i = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
        j = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
        att = jnp.where(j <= i, att, jnp.finfo(att.dtype).min)
        att = jax.nn.softmax(att, axis=-1)
        y = jnp.einsum("bhij,bjhd->bihd", att, v).reshape(B, T, C)
        return nn.Dense(self.n_embd, dtype=self.dtype)(y)


class TransformerBlock(nn.Module):
    n_embd: int
    n_head: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(dtype=self.dtype)(x)
        x = x + CausalSelfAttention(self.n_embd, self.n_head, dtype=self.dtype)(h)
        h = nn.LayerNorm(dtype=self.dtype)(x)
        h = nn.Dense(4 * self.n_embd, dtype=self.dtype)(h)
        h = jax.nn.gelu(h)
        return x + nn.Dense(self.n_embd, dtype=self.dtype)(h)


# gpt-nano by default, like the reference's active config
class VPCT(nn.Module):
    vocab_size: int       # input channels per token
    block_size: int       # num_views * h * w tokens
    out_size: int
    n_layer: int = 3
    n_head: int = 3
    n_embd: int = 48
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, idx):
        """idx: [B, T, vocab_size] -> shifted predictions [B, T, out_size]."""
        B, T, _ = idx.shape
        tok = nn.Dense(self.n_embd, dtype=self.dtype)(idx)
        wpe = self.param(
            "wpe", nn.initializers.normal(0.02), (self.block_size, self.n_embd)
        )
        x = tok + wpe[None, :T]
        for _ in range(self.n_layer):
            x = TransformerBlock(self.n_embd, self.n_head, dtype=self.dtype)(x)
        x = nn.LayerNorm(dtype=self.dtype)(x)
        logits = nn.Dense(self.out_size, use_bias=False, dtype=self.dtype)(x)
        # Entroformer shift token: token t receives the prediction made from
        # tokens < t; token 0 gets a learned start token
        start = self.param(
            "param_token", nn.initializers.normal(1.0), (1, 1, self.out_size)
        )
        return jnp.concatenate(
            [jnp.broadcast_to(start, (B, 1, self.out_size)), logits[:, :-1]], axis=1
        )


class ContextVP(nn.Module):
    """Wraps VPCT for [(B*V), H, W, C] feature maps (views folded in batch)."""

    out_channels: int
    num_views: int = 4
    width: int = 16
    height: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        BV, H, W, C = x.shape
        B = BV // self.num_views
        tokens = x.reshape(B, self.num_views * H * W, C)
        out = VPCT(
            vocab_size=C,
            block_size=self.num_views * self.width * self.height,
            out_size=self.out_channels,
            dtype=self.dtype,
        )(tokens)
        return out.reshape(BV, H, W, self.out_channels)
