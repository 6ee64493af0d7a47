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
    round-3 candidate: NHWC->planar pad in, pre-tiled flow in, tiled->NHWC
    untile out; warp_kernel.py _pallas_warp operand prep). Each formatted
    array passes through lax.optimization_barrier before the reduction so
    XLA must materialize it (it cannot fuse the transpose/pad into the
    mean) — mirroring the real dispatch, where the pallas_call operand
    forces materialization. Stages are still timed standalone, so fusion
    ACROSS stages in the full dispatch can differ slightly."""
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
    flow = jax.random.uniform(key, (B, H, W, 2), jnp.float32)
    tiled = jax.random.uniform(key, (B, nI, nJ, C, p), dtype)

    def fmt_in(i):
        xpad = jnp.pad(
            i.transpose(0, 3, 1, 2),
            ((0, 0), (0, 0), (R, Hh - th - R), (R, Wh - TILE_W - R)),
            mode="edge",
        )
        return jnp.mean(jax.lax.optimization_barrier(xpad))

    def fmt_flow(f):
        flow_t = (
            f.reshape(B, nI, th, nJ, TILE_W, 2)
            .transpose(0, 1, 3, 5, 2, 4)
            .reshape(B, nI, nJ, 2, p)
        )
        return jnp.mean(jax.lax.optimization_barrier(flow_t))

    def untile(o):
        o = o.reshape(B, nI, nJ, C, th, TILE_W)
        out = o.transpose(0, 1, 4, 2, 5, 3).reshape(B, H, W, C)
        return jnp.mean(jax.lax.optimization_barrier(out))

    for tag, fn, arg in (
        ("fmt_in", fmt_in, img),
        ("fmt_flow", fmt_flow, flow),
        ("untile", untile, tiled),
    ):
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
    # usage: warp_bench.py [CASE_SUBSTRING] [--no-kernel] [--no-fmt]
    # The case-name filter applies to BOTH the kernel and the formatting
    # benches; --no-kernel / --no-fmt skip a whole section.
    argv = sys.argv[1:]
    run_kernel = "--no-kernel" not in argv
    run_fmt = "--no-fmt" not in argv
    words = [a for a in argv if not a.startswith("--")]
    only = words[0] if words else ""
    bench_null()
    if run_kernel:
        for case in CASES:
            if only and only not in case[0]:
                continue
            try:
                bench(*case)
            except Exception as e:  # compile failures (VMEM OOM) shouldn't
                print(f"{case[0]}: FAILED {type(e).__name__}: {str(e)[:200]}")
            sys.stdout.flush()
    if run_fmt:
        for name, B, H, W, C, R, pixel_mode, dtype in CASES[:2]:
            if only and only not in name:
                continue
            try:
                bench_formatting(name, B, H, W, C, R, dtype)
            except Exception as e:
                print(f"{name}:fmt FAILED {type(e).__name__}: {str(e)[:200]}")
            sys.stdout.flush()
