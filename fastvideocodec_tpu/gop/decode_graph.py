"""Receiver-side decode graph for the LSVC tree codec.

The decode-only device graph (mv synthesis + log-depth tree motion
compensation + hyper/residual synthesis from quantized latents +
depth-to-space) is what a receiver runs per GOP after the host entropy
decoder has produced the quantized latents. It is shared by three
consumers that must time the SAME computation: the headline benchmark
(bench.py), the resolution/GOP sweeps (tools/speed_sweep.py), and the
estimated-bits eval harness (train/evaluate.py), whose 2-line log needs a
genuinely separate dec_t next to enc_t (reference eval.py:316-337 fills
distinct encode/decode meters even without real bitstreams).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fastvideocodec_tpu.layers.transforms import OUT_CHANNEL_M, OUT_CHANNEL_N
from fastvideocodec_tpu.ops import depth_to_space


def build_lsvc_decode(module, GOP: int, H: int, W: int, dtype=None):
    """Decode graph for an LSVC module at [GOP, H, W] full resolution.

    Returns (decode_fn, example_latents) where
    ``decode_fn(params, iframe_s2d, mv_q, z_qs, feat_qs)`` reduces to two
    live scalars (recon mean + sigma mean — sigma parameterizes the HOST
    entropy decode so it needs an explicit consumer to stay in the timed
    graph). ``example_latents`` are random quantized latents with the
    exact shapes the host entropy decoder would produce.
    """
    bs = GOP - 1
    sched = module.schedule(bs)
    s2d = module.s2d
    dtype = dtype or module.dtype

    def decode(p, iframe_s2d, mv_q, z_qs, feat_qs):
        mv_hat = module.apply(p, mv_q, method=lambda m, q: m.mv_decoder(q))
        com = [None] * bs
        sigma_sum = jnp.zeros((), jnp.float32)
        for li, layer in enumerate(sched.layers):
            sigma = module.apply(
                p, z_qs[li], method=lambda m, z: m.prior_decoder(z)
            )
            sigma_sum = sigma_sum + jnp.mean(sigma).astype(jnp.float32)
            chunk = module.layer_chunk if module.layer_chunk > 0 else len(layer)
            for ci in range(0, len(layer), chunk):
                part = layer[ci : ci + chunk]
                refs = [
                    iframe_s2d
                    if sched.parents[f] == 0
                    else com[sched.parents[f] - 1]
                    for f in part
                ]
                ref = jnp.stack(refs)
                ids = jnp.asarray([f - 1 for f in part])
                mc, _ = module.apply(
                    p, ref, mv_hat[ids],
                    method=lambda m, r, d: m.motioncompensation(r, d),
                )
                res_hat = module.apply(
                    p, feat_qs[li][ci : ci + chunk],
                    method=lambda m, f: m.res_decoder(f),
                )
                com_frames = jnp.clip(res_hat + mc, 0.0, 1.0)
                for i, f in enumerate(part):
                    com[f - 1] = com_frames[i]
        out = jnp.stack(com)
        if s2d > 1:
            out = depth_to_space(out, s2d)
        return jnp.mean(out), sigma_sum

    key = jax.random.PRNGKey(0)
    lh, lw = H // 16, W // 16  # latent resolution (/16 of full, both configs)
    mv_q = jax.random.normal(key, (bs, lh, lw, module.channels), dtype)
    z_qs = [
        jax.random.normal(key, (len(l), lh // 4, lw // 4, OUT_CHANNEL_N), dtype)
        for l in sched.layers
    ]
    feat_qs = [
        jax.random.normal(key, (len(l), lh, lw, OUT_CHANNEL_M), dtype)
        for l in sched.layers
    ]
    return decode, (mv_q, z_qs, feat_qs)
