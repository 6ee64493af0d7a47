"""Quantify the Pallas warp's clamp semantics against the exact XLA path
on REAL SpyNet flows (the shipped pretrained weights), at eval resolution.

Two approximations distinguish the TPU kernel from ops.warp's exact
grid-sample semantics (ops/pallas/warp_kernel.py docstring):
  1. |flow| clamps at the per-call max_displacement R (since v1);
  2. v5 offset mode: per-tile vertical spread beyond the ~±11-row residual
     window clamps toward the tile midrange (motion-boundary tiles).

This probe runs the pretrained SpyNet on a 1080p pair with BOTH smooth
global motion and a hard motion boundary (a translating foreground block
over a counter-translating background), then warps the reference frame
with the resulting flow through (a) the exact XLA path and (b) the Pallas
kernel, reporting warp-PSNR to the target and the fraction of pixels whose
sampled value differs — i.e. exactly how much reconstruction quality the
TPU fast path costs at the warp stage. Run on the chip:

    python tools/warp_semantics_probe.py [--mag PIXELS]

(The real-bitstream coder paths force the exact path on both sides, so
bitstream identity is never at stake — this measures the TRAINING/eval
fast-path quality gap only.)
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fastvideocodec_tpu.layers.spynet import SpyNet, load_pretrained_spynet
from fastvideocodec_tpu.ops.warp import exact_warp, flow_warp


def make_pair(key, H, W, mag):
    """Reference/target pair: textured background translating by (+mag, 0)
    and a foreground block translating by (-mag, -mag) — a hard vertical
    motion boundary for the v5 per-tile spread budget."""
    kb, kf = jax.random.split(key)
    pad = int(2 * mag) + 8
    bg = jax.random.uniform(kb, (1, H + 2 * pad, W + 2 * pad, 3))
    # smooth the texture so SpyNet can actually track it
    k = jnp.ones((7, 7, 1, 1)) / 49.0
    bg = jax.lax.conv_general_dilated(
        bg.transpose(0, 3, 1, 2).reshape(3, 1, H + 2 * pad, W + 2 * pad),
        k.transpose(3, 2, 0, 1), (1, 1), "SAME",
    ).reshape(1, 3, H + 2 * pad, W + 2 * pad).transpose(0, 2, 3, 1)
    fg = jax.random.uniform(kf, (1, H // 3 + 2 * pad, W // 3 + 2 * pad, 3))
    fg = jax.lax.conv_general_dilated(
        fg.transpose(0, 3, 1, 2).reshape(3, 1, fg.shape[1], fg.shape[2]),
        k.transpose(3, 2, 0, 1), (1, 1), "SAME",
    ).reshape(1, 3, fg.shape[1], fg.shape[2]).transpose(0, 2, 3, 1)

    def frame(t):
        d = int(round(mag * t))
        # background translates VERTICALLY (+mag), foreground (-mag,-mag):
        # boundary tiles see ~2*mag of vertical flow spread — the hard case
        # for the v5 per-tile residual window
        ref = jax.lax.dynamic_slice(
            bg, (0, pad + d, pad, 0), (1, H, W, 3)
        )
        patch = jax.lax.dynamic_slice(
            fg, (0, pad, pad, 0), (1, H // 3, W // 3, 3)
        )
        return jax.lax.dynamic_update_slice(
            ref, patch, (0, H // 3 - d, W // 3 - d, 0)
        )

    return frame(0), frame(1)  # (reference t=0, target t=1)


def psnr(a, b):
    mse = jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2)
    return -10.0 * jnp.log10(mse + 1e-12)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mag", type=float, default=24.0,
                    help="motion magnitude in pixels (per direction)")
    ap.add_argument("--height", type=int, default=1024)
    ap.add_argument("--width", type=int, default=1920)
    args = ap.parse_args()

    H, W = args.height, args.width
    key = jax.random.PRNGKey(0)
    ref, tgt = make_pair(key, H, W, args.mag)

    net = SpyNet()
    params = net.init(key, tgt, ref)
    params = {"params": load_pretrained_spynet(params["params"])}
    flow = jax.jit(net.apply)(params, tgt, ref)
    flow = jax.block_until_ready(flow)
    fstat = (float(jnp.abs(flow[..., 0]).max()), float(jnp.abs(flow[..., 1]).max()))
    print(f"SpyNet flow max |fx|,|fy| = {fstat[0]:.1f}, {fstat[1]:.1f} px")

    with exact_warp():
        w_exact = jax.block_until_ready(
            jax.jit(lambda r, f: flow_warp(r, f))(ref, flow))
    w_fast = jax.block_until_ready(
        jax.jit(lambda r, f: flow_warp(r, f))(ref, flow))

    p_exact = float(psnr(w_exact, tgt))
    p_fast = float(psnr(w_fast, tgt))
    diff = jnp.abs(w_fast.astype(jnp.float32) - w_exact.astype(jnp.float32))
    frac3 = float(jnp.mean((diff > 1e-3).astype(jnp.float32)))
    frac6 = float(jnp.mean((diff > 1e-6).astype(jnp.float32)))
    print(f"warp-PSNR to target: exact {p_exact:.3f} dB | pallas {p_fast:.3f} dB "
          f"(delta {p_fast - p_exact:+.4f} dB)")
    print(f"pixels differing between paths: >1e-3 {frac3 * 100:.4f}% | "
          f">1e-6 {frac6 * 100:.4f}% (nonzero proves the fast path ran) | "
          f"max |diff| {float(diff.max()):.6f}")


if __name__ == "__main__":
    main()
