"""Headline benchmark: LSVC ("Hermes") whole-GOP encode+decode throughput at
1080p on one TPU chip.

Reference baseline: LSVC decodes at 0.0310 s/frame (~32 fps) on a GTX
1080 Ti (BASELINE.md; plot_hermes.py:735-737) and the repo's north star is
>=30 fps 1080p encode+decode per v5e chip. This bench times the full
tree-parallel GOP=16 forward (flow + motion coding + log-depth MC/residual
coding, i.e. encode AND decode transforms) at 1024x2048 in bfloat16 and
reports frames/s; vs_baseline is against the 32.26 fps reference decode.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time
from functools import partial

import jax
import jax.numpy as jnp


def main():
    from fastvideocodec_tpu.models import get_codec_model
    from fastvideocodec_tpu.gop import rollout

    GOP = 16  # 1 I-frame + 15 P-frames (eval.py:495 fP=15)
    H, W = 1024, 2048

    from fastvideocodec_tpu.models import LSVC

    spec = get_codec_model("LSVC-128", dtype=jnp.bfloat16)
    # per-layer motion staging: identical math, ~2x lower peak HBM — needed
    # to fit the whole 1080p GOP on one 16GB v5e chip
    spec.module = LSVC(
        channels=128, per_layer_mv=True, layer_chunk=4, dtype=jnp.bfloat16
    )
    module = spec.module

    key = jax.random.PRNGKey(0)
    small = jax.random.uniform(key, (GOP, 256, 256, 3), dtype=jnp.bfloat16)
    params = jax.jit(partial(module.init, training=False))({"params": key}, small)

    gop = jax.random.uniform(key, (GOP, H, W, 3), dtype=jnp.bfloat16)

    def run(p, g):
        com, metrics = rollout(spec, p, g, training=False, rng=None)
        # reduce outputs to scalars so the timing loop transfers O(1) bytes
        # but ALL compute stays live
        return jnp.mean(com), metrics["bpp"], metrics["rec_loss"]

    fn = jax.jit(run)
    # warmup / compile; host-materialize (block_until_ready can return
    # before the remote compile+execute completes under the axon relay)
    out = fn(params, gop)
    _ = float(out[0])

    iters = 5
    # distinct inputs per iteration: the axon relay memoizes identical
    # (executable, args) executions, which would time as ~0ms
    # (the perturbation must exceed the bf16 ulp or the buffers are
    # bitwise-identical and memoization still hits)
    gops = [
        jax.block_until_ready(jnp.clip(gop * (0.8 + 0.04 * i), 0, 1))
        for i in range(iters)
    ]
    times = []
    vals = []
    for i in range(iters):
        t0 = time.perf_counter()
        out = fn(params, gops[i])
        # under the axon relay, block_until_ready can resolve before remote
        # execution completes; materializing the scalar on host is the only
        # honest sync point
        vals.append(float(out[0]))
        times.append(time.perf_counter() - t0)
    dt = sum(times)
    # sanity: per-iter spread printed to stderr for debugging
    import sys

    print(
        f"iters(s): {[round(t, 4) for t in times]} mean_recon={vals[-1]:.4f} "
        f"(all: {[round(v, 4) for v in vals]})",
        file=sys.stderr,
    )

    frames = (GOP - 1) * iters
    fps = frames / dt if dt > 0 else float("nan")
    baseline_fps = 1.0 / 0.0310  # LSVC on GTX 1080 Ti, plot_hermes.py:735
    print(
        json.dumps(
            {
                "metric": "lsvc_1080p_gop16_encdec_fps",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / baseline_fps, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
