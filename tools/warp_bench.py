"""Warp kernel micro-bench on the real chip: full-res RGB (SpyNet-style),
s2d LSVC-TPU shape, and the SSF volume pixel-mode shape.

Timing through the axon relay: reduce to a scalar inside jit, pre-build
DISTINCT inputs (the relay memoizes identical executions), and
host-materialize the scalar (block_until_ready can return early)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from fastvideocodec_tpu.ops.pallas.warp_kernel import _pallas_warp

CASES = [
    # (name, B, H, W, C, R, pixel_mode, dtype)
    ("rgb_1080p_R56", 4, 1024, 2048, 3, 56, False, jnp.bfloat16),
    ("s2d_lsvctpu_R28", 15, 512, 1024, 12, 28, False, jnp.bfloat16),
    ("ssf_vol_R8", 4, 1024, 2048, 18, 8, True, jnp.bfloat16),
    ("rgb_1080p_R56_f32", 4, 1024, 2048, 3, 56, False, jnp.float32),
]


def bench(name, B, H, W, C, R, pixel_mode, dtype):
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    img = jax.random.uniform(k1, (B, H, W, C), dtype)
    flow = (jax.random.uniform(k2, (B, H, W, 2), jnp.float32) - 0.5) * R
    fn = jax.jit(
        lambda i, f: jnp.mean(_pallas_warp(i, f, R, pixel_mode=pixel_mode))
    )
    _ = float(fn(img, flow))  # compile + warm
    iters = 5
    imgs = [
        jax.block_until_ready(jnp.clip(img * (0.8 + 0.04 * i), 0, 1))
        for i in range(iters)
    ]
    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        _ = float(fn(imgs[i], flow))
        ts.append(time.perf_counter() - t0)
    print(f"{name}: min {min(ts)*1e3:.2f} ms  all {[round(t*1e3,2) for t in ts]}")




def bench_formatting(name, B, H, W, C, R, dtype):
    """Quantify the XLA data-formatting copies around the kernel (ROADMAP
    round-3 candidate: NHWC->planar pad in, tiled->NHWC untile out). Times
    each stage standalone — fusion inside the full dispatch can differ, so
    treat as an upper-bound share, not an exact split."""
    from fastvideocodec_tpu.ops.pallas.warp_kernel import (
        TILE_H, TILE_W, _round_up,
    )

    th = TILE_H
    Hh = _round_up(th + 2 * R + 1, 8)
    Wh = _round_up(TILE_W + 2 * R + 1, TILE_W)
    nI, nJ = H // th, W // TILE_W
    p = th * TILE_W

    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (B, H, W, C), dtype)
    tiled = jax.random.uniform(key, (B, nI, nJ, C, p), dtype)

    def fmt_in(i):
        xpad = jnp.pad(
            i.transpose(0, 3, 1, 2),
            ((0, 0), (0, 0), (R, Hh - th - R), (R, Wh - TILE_W - R)),
            mode="edge",
        )
        return jnp.mean(xpad)

    def untile(o):
        o = o.reshape(B, nI, nJ, C, th, TILE_W)
        return jnp.mean(o.transpose(0, 1, 4, 2, 5, 3).reshape(B, H, W, C))

    for tag, fn, arg in (("fmt_in", fmt_in, img), ("untile", untile, tiled)):
        jf = jax.jit(fn)
        _ = float(jf(arg))
        iters = 5
        args = [
            jax.block_until_ready(arg * (0.8 + 0.04 * i)) for i in range(iters)
        ]
        ts = []
        for i in range(iters):
            t0 = time.perf_counter()
            _ = float(jf(args[i]))
            ts.append(time.perf_counter() - t0)
        print(f"{name}:{tag}: min {min(ts)*1e3:.2f} ms  all {[round(t*1e3,2) for t in ts]}")


def bench_null():
    """Measurement floor: a trivial reduction over the same-size input —
    isolates relay RPC + scalar-transfer overhead from kernel time."""
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (4, 1024, 2048, 3), jnp.bfloat16)
    fn = jax.jit(lambda i: jnp.mean(i))
    _ = float(fn(img))
    iters = 5
    imgs = [
        jax.block_until_ready(jnp.clip(img * (0.8 + 0.04 * i), 0, 1))
        for i in range(iters)
    ]
    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        _ = float(fn(imgs[i]))
        ts.append(time.perf_counter() - t0)
    print(f"null_mean_floor: min {min(ts)*1e3:.2f} ms  all {[round(t*1e3,2) for t in ts]}")


if __name__ == "__main__":
    only = sys.argv[1] if len(sys.argv) > 1 else ""
    bench_null()
    for case in CASES:
        if only and only not in case[0]:
            continue
        try:
            bench(*case)
        except Exception as e:  # compile failures (VMEM OOM) shouldn't
            print(f"{case[0]}: FAILED {type(e).__name__}: {str(e)[:200]}")
        sys.stdout.flush()
    if not only or only == "fmt":
        for name, B, H, W, C, R, pixel_mode, dtype in CASES[:2]:
            try:
                bench_formatting(name, B, H, W, C, R, dtype)
            except Exception as e:
                print(f"{name}:fmt FAILED {type(e).__name__}: {str(e)[:200]}")
            sys.stdout.flush()
