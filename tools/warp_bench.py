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
    bench_null()
    for case in CASES:
        try:
            bench(*case)
        except Exception as e:  # compile failures (VMEM OOM) shouldn't
            print(f"{case[0]}: FAILED {type(e).__name__}: {str(e)[:200]}")
        sys.stdout.flush()
