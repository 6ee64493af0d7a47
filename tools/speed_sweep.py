"""Speed-scaling sweeps mirroring the reference's headline speed plots.

Reference anchors (BASELINE.md):
- LSVC decode s/frame vs GOP capacity: 0.02196 -> 0.00689 (46 -> 145 fps)
  for GOP 1 -> 30 on an RTX 3090 at 640x960 (plot_hermes.py:849-857) —
  the tree codec's signature: throughput GROWS with GOP because the tree
  depth is log2(GOP) while the frame batch widens.
- SSF-family encode s/frame: SSF 0.0058 / ELFVC 0.0069 / Vesper(SP) 0.013
  (plot_vesper.py:760-763, NSDI24 testbed GPU).
- MCVC decode vs view count (plot_mcvc.py:713-722) is covered by
  `python -m fastvideocodec_tpu.cli.train_multiview --task speed`.

This tool measures the TPU equivalents at 1024x2048 bf16 on one chip and
prints one JSON line per point:
  {"sweep": "lsvc_gop", "gop": N, "encdec_fps": ..., "decode_fps": ...}
  {"sweep": "ssf_encode", "codec": ..., "enc_fps": ...}

Timing through the axon relay: reduce to scalars inside jit, perturb
inputs between iterations (the relay memoizes identical executions), and
host-materialize results (block_until_ready can return early).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench import build_lsvc_decode
from fastvideocodec_tpu.gop import rollout
from fastvideocodec_tpu.models import get_codec_model
from fastvideocodec_tpu.ops import space_to_depth

H, W = 1024, 2048
ITERS = 3
SCANS = 4  # GOPs per jit call — amortizes the relay's ~45 ms dispatch floor


def _time(fn, *args, perturb=0):
    """Median wall time per fn(*args) call. SCANS distinctly-scaled
    variants of args[perturb] run inside ONE jit via lax.scan (matching
    bench.py: the axon relay adds a ~45 ms dispatch+sync floor per call,
    a large fraction of a GOP at current rates); scalars are summed and
    host-materialized (block_until_ready can return early)."""
    dt = args[perturb].dtype

    def many(scales, *a):
        def body(_, s):
            aa = list(a)
            aa[perturb] = a[perturb] * s
            return None, fn(*aa)
        _, outs = jax.lax.scan(body, None, scales)
        return jax.tree_util.tree_map(jnp.sum, outs)

    jmany = jax.jit(many)
    warm = jnp.asarray([1.0 - 0.01 * s for s in range(SCANS)], dt)
    _ = jax.tree_util.tree_map(float, jmany(warm, *args))  # compile + warm
    ts = []
    for i in range(ITERS):
        scales = jax.block_until_ready(jnp.asarray(
            [0.7 + 0.03 * (i * SCANS + s) for s in range(SCANS)], dt
        ))
        t0 = time.perf_counter()
        out = jmany(scales, *args)
        _ = jax.tree_util.tree_map(float, out)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2] / SCANS


def lsvc_gop_sweep(gops, codec="LSVC-TPU"):
    spec = get_codec_model(codec, dtype=jnp.bfloat16)
    if spec.family != "lsvc":
        raise SystemExit(
            f"--codec {codec!r} resolves to family '{spec.family}'; the GOP "
            "sweep drives the LSVC tree schedule and decode graph — pass an "
            "LSVC config (e.g. LSVC-TPU, LSVC-128, LSVC-TPU-F)"
        )
    module = spec.module
    key = jax.random.PRNGKey(0)
    small = jax.random.uniform(key, (4, 256, 256, 3), dtype=jnp.bfloat16)
    params = jax.jit(
        lambda k, g: module.init({"params": k}, g, training=False)
    )(key, small)
    for gop in gops:
        x = jax.random.uniform(key, (gop, H, W, 3), dtype=jnp.bfloat16)

        def run(g):
            com, m = rollout(spec, params, g, training=False, rng=None)
            return jnp.mean(com), m["bpp"]

        dt = _time(jax.jit(run), x)
        encdec = (gop - 1) / dt

        decode, (mv_q, z_qs, feat_qs) = build_lsvc_decode(module, gop, H, W)
        ifr = space_to_depth(x[0:1], module.s2d)[0] if module.s2d > 1 else x[0]
        dfn = jax.jit(decode)
        ddt = _time(lambda mv: dfn(params, ifr, mv, z_qs, feat_qs), mv_q)
        print(json.dumps({
            "sweep": "lsvc_gop", "gop": gop,
            "encdec_fps": round(encdec, 2),
            "decode_fps": round((gop - 1) / ddt, 2),
            "decode_s_per_frame": round(ddt / (gop - 1), 5),
        }), flush=True)


def ssf_encode_sweep(names):
    key = jax.random.PRNGKey(0)
    for name in names:
        spec = get_codec_model(name, dtype=jnp.bfloat16)
        gop = 8
        x = jax.random.uniform(key, (gop, H, W, 3), dtype=jnp.bfloat16)
        small = jax.random.uniform(key, (2, 1, 256, 256, 3), dtype=jnp.bfloat16)
        params = jax.jit(
            lambda k, g: spec.module.init({"params": k}, g, training=False)
        )(key, small)

        def run(g):
            com, m = rollout(spec, params, g, training=False, rng=None)
            return jnp.mean(com), jnp.mean(m["bpp_est"])

        dt = _time(jax.jit(run), x)
        print(json.dumps({
            "sweep": "ssf_encode", "codec": name,
            "enc_fps": round((gop - 1) / dt, 2),
            "s_per_frame": round(dt / (gop - 1), 5),
        }), flush=True)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--gops", type=int, nargs="*", default=[2, 4, 8, 16, 30])
    p.add_argument("--ssf", nargs="*", default=["SSF-Official", "ELFVC", "ELFVC-SP"])
    p.add_argument("--skip-ssf", action="store_true")
    p.add_argument("--skip-lsvc", action="store_true")
    p.add_argument("--codec", default="LSVC-TPU",
                   help="LSVC config for the GOP sweep (e.g. LSVC-TPU-F "
                   "to price the full-res MC warp)")
    args = p.parse_args()
    if not args.skip_lsvc:
        lsvc_gop_sweep(args.gops, codec=args.codec)
    if not args.skip_ssf:
        ssf_encode_sweep(args.ssf)
