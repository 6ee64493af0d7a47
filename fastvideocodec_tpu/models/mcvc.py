"""MCVC / MCVC-IA(-OLFT): multi-camera joint codec.

Reference models.py:2240-2400. Views are folded into the batch axis
([B*V, H, W, 3]); per-GOP a random subset of views "fails" and is zero-
masked. The IA ("imbalanced attention") variant adds backup img/res
decoders whose first stage is a cross-view attention over (view, x, y)
tokens, decoding *masked* latents so surviving views reconstruct the lost
ones. OLFT ("online fine-tuning") additionally samples the top-r% pixels by
reconstruction error as host-side "touch-up" labels (models.py:2192-2235) —
see `fastvideocodec_tpu.train.olft`.

TPU mapping: the folded view axis is shardable over the mesh 'view' axis;
the cross-view attention is the only op coupling views, and XLA turns it
into an all-gather over ICI (SURVEY.md §2.7 'view parallel').
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from fastvideocodec_tpu.entropy.hyperprior import SSFHyperprior
from fastvideocodec_tpu.layers.blocks import ConvAttention
from fastvideocodec_tpu.layers.transforms import SSFDecoder, SSFEncoder
from fastvideocodec_tpu.models.ssf import ScaleSpaceFlow


class AttnDecoder(nn.Module):
    """Residual cross-view attention followed by the SSF decoder stack
    (reference MCVC Decoder with attn=True, models.py:2256-2280)."""

    out_planes: int
    num_views: int
    use_attn: bool = True
    mid_planes: int = 128
    attn_heads: int = 8
    attn_dim_head: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.use_attn:
            x = x + ConvAttention(
                x.shape[-1], heads=self.attn_heads, dim_head=self.attn_dim_head,
                atype=2, num_views=self.num_views, dtype=self.dtype,
            )(x)
        return SSFDecoder(
            self.mid_planes, out_planes=self.out_planes, dtype=self.dtype
        )(x)


def mask_views(x: jax.Array, mask: jax.Array) -> jax.Array:
    """Zero failed views. x: [B*V, ...]; mask: [B*V] of {0,1}."""
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    return x * mask.reshape(shape).astype(x.dtype)


def sample_view_mask(
    rng: np.random.Generator,
    batch: int,
    num_views: int,
    max_failed: int,
    failure_probability: float = 0.1,
    force_resilience: int = -1,
    training: bool = True,
) -> np.ndarray:
    """Host-side binomial view-failure draw (models.py:2140-2183).

    Returns a {0,1} mask of shape [batch*num_views]; the same views fail
    across the batch replica dimension, matching the reference.
    """
    max_failed = min(num_views - 1, max_failed)
    if force_resilience >= 0:
        failed = force_resilience
    elif max_failed <= 0:
        failed = 0
    else:
        ks = np.arange(max_failed + 1)
        if training:
            from math import comb

            p = failure_probability
            probs = np.array(
                [comb(num_views, int(k)) * p ** k * (1 - p) ** (num_views - k) for k in ks],
                dtype=np.float64,
            )
            probs /= probs.sum()
        else:
            probs = np.full(max_failed + 1, 1.0 / (max_failed + 1))
        failed = int(rng.choice(ks, p=probs))
    alive = rng.choice(num_views, size=num_views - failed, replace=False)
    view_mask = np.zeros(num_views, dtype=np.float32)
    view_mask[alive] = 1.0
    return np.tile(view_mask, batch)


class MCVC(nn.Module):
    """__call__ runs a whole GOP: frames [T, B*V, H, W, 3] + mask [B*V]."""

    num_views: int = 4
    imbalanced_correlation: bool = True  # '-IA'
    use_attn: bool = True
    num_levels: int = 5
    sigma0: float = 1.5
    scale_field_shift: float = 1.0
    planes: int = 192
    mid_planes: int = 128
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        dt = self.dtype
        mp, pl = self.mid_planes, self.planes
        self.img_encoder = SSFEncoder(mp, pl, dtype=dt)
        self.img_decoder = SSFDecoder(mp, out_planes=3, dtype=dt)
        self.img_hyperprior = SSFHyperprior(planes=pl, mid_planes=pl, dtype=dt)
        self.motion_encoder = SSFEncoder(mp, pl, dtype=dt)
        self.motion_decoder = SSFDecoder(mp, out_planes=3, dtype=dt)
        self.motion_hyperprior = SSFHyperprior(planes=pl, mid_planes=pl, dtype=dt)
        self.res_encoder = SSFEncoder(mp, pl, dtype=dt)
        self.res_decoder = SSFDecoder(mp, out_planes=3, dtype=dt)
        self.res_hyperprior = SSFHyperprior(planes=pl, mid_planes=pl, dtype=dt)
        if self.imbalanced_correlation:
            # reference heads=8/dim_head=64 (models.py:2272); scaled down
            # only for miniature configs
            heads, dim_head = (8, 64) if pl >= 128 else (4, max(pl // 4, 8))
            self.backup_img_decoder = AttnDecoder(
                3, self.num_views, self.use_attn, mid_planes=mp,
                attn_heads=heads, attn_dim_head=dim_head, dtype=dt,
            )
            self.backup_res_decoder = AttnDecoder(
                3, self.num_views, self.use_attn, mid_planes=mp,
                attn_heads=heads, attn_dim_head=dim_head, dtype=dt,
            )

    forward_prediction = ScaleSpaceFlow.forward_prediction
    make_volume = ScaleSpaceFlow.make_volume
    warp_prediction = ScaleSpaceFlow.warp_prediction

    def forward_keyframe(self, x, mask, training: bool, rng=None):
        x = mask_views(x, mask)
        y = self.img_encoder(x)
        y_hat, lik, _ = self.img_hyperprior(y, training=training, rng=rng)
        x_hat = self.img_decoder(y_hat)
        if not self.imbalanced_correlation:
            return x_hat, x_hat, {"keyframe": lik}
        masked_x_hat = self.backup_img_decoder(mask_views(y_hat, mask))
        return x_hat, masked_x_hat, {"keyframe": lik}

    def forward_inter(self, x_cur, x_ref, mask, training: bool, rng=None):
        rngs = jax.random.split(rng, 2) if rng is not None else (None, None)
        x_cur = mask_views(x_cur, mask)
        x_ref = mask_views(x_ref, mask)

        y_motion = self.motion_encoder(jnp.concatenate([x_cur, x_ref], axis=-1))
        y_motion_hat, motion_lik, _ = self.motion_hyperprior(
            y_motion, training=training, rng=rngs[0]
        )
        motion_info = self.motion_decoder(y_motion_hat)
        x_pred = self.forward_prediction(x_ref, motion_info)

        x_res = x_cur - x_pred
        y_res = self.res_encoder(x_res)
        y_res_hat, res_lik, _ = self.res_hyperprior(y_res, training=training, rng=rngs[1])
        x_res_hat = self.res_decoder(jnp.concatenate([y_res_hat, y_motion_hat], axis=-1))
        x_rec = x_pred + x_res_hat

        lik = {"motion": motion_lik, "residual": res_lik}
        if not self.imbalanced_correlation:
            return x_rec, x_rec, lik
        ym = mask_views(y_motion_hat, mask)
        yr = mask_views(y_res_hat, mask)
        masked_x_res_hat = self.backup_res_decoder(jnp.concatenate([yr, ym], axis=-1))
        masked_x_rec = x_pred + masked_x_res_hat
        return x_rec, masked_x_rec, lik

    def __call__(self, frames, mask, training: bool, rng=None):
        """frames: [T, B*V, H, W, 3]; mask: [B*V] of {0,1}.

        Returns (reconstructions [T, ...] — the *enhanced* (backup-decoded)
        frames for IA, likelihood pytrees list, references list) matching
        the reference forward (models.py:2297-2352). The inter frames run
        under nn.scan (params broadcast, carry = detached x_ref): every
        inter step is identical, so the compiled program contains ONE
        inter body instead of T-1 unrolled copies — at GOP 16 the python
        unroll pushed XLA compile past 9 minutes on the remote chip. The
        cross-view attention stays one fused batched op per frame (views
        live in the body's batch axis, not the scan axis)."""
        T = frames.shape[0]
        use_rng = rng is not None
        rngs = jax.random.split(rng, T) if use_rng else None
        x_ref, x_enh, lik0 = self.forward_keyframe(
            frames[0], mask, training=training, rng=rngs[0] if use_rng else None
        )
        if T == 1:
            return x_enh[None], [lik0], x_ref[None]

        def body(mdl, carry, xs):
            x_cur, r = xs if use_rng else (xs, None)
            x_rec, x_enh_i, lik = mdl.forward_inter(
                x_cur, carry, mask, training=training, rng=r
            )
            # outputs stay attached; only the NEXT frame's reference is
            # detached (reference per-frame detach semantics)
            return jax.lax.stop_gradient(x_rec), (x_rec, x_enh_i, lik)

        scan = nn.scan(
            body, variable_broadcast="params", split_rngs={"params": False},
            in_axes=0, out_axes=0,
        )
        xs = (frames[1:], rngs[1:]) if use_rng else frames[1:]
        _, (refs_s, enh_s, liks_s) = scan(self, jax.lax.stop_gradient(x_ref), xs)
        recons = jnp.concatenate([x_enh[None], enh_s], axis=0)
        refs = jnp.concatenate([x_ref[None], refs_s], axis=0)
        liks = [lik0] + [
            jax.tree_util.tree_map(lambda a, i=i: a[i], liks_s)
            for i in range(T - 1)
        ]
        return recons, liks, refs

    def aux_loss(self):
        return (
            self.img_hyperprior.aux_loss()
            + self.motion_hyperprior.aux_loss()
            + self.res_hyperprior.aux_loss()
        )
