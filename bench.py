"""Headline benchmark: LSVC ("Hermes") whole-GOP decode throughput at 1080p
on one TPU chip, apples-to-apples with the reference baseline.

Reference baseline: LSVC decodes at 0.0310 s/frame (~32 fps) on a GTX
1080 Ti at 640x960 (BASELINE.md; plot_hermes.py:735-737). This bench times
the tree-parallel GOP=16 DECODE path (mv synthesis + log-depth motion
compensation + hyper/residual synthesis + depth-to-space — everything the
receiver runs on device, excluding host entropy decoding) at the harder
1024x2048, in bfloat16, for the TPU-native LSVC-TPU configuration
(space-to-depth domain; models/lsvc.py docstring). The full encode+decode
fps (flow estimation + analysis transforms included, the repo's >=30 fps
north star) is printed to stderr alongside.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp


def build_lsvc_decode(module, GOP: int, H: int, W: int):
    """Shared decode-graph builder (moved to the package so the eval
    harness can time the same graph): see gop/decode_graph.py."""
    from fastvideocodec_tpu.gop.decode_graph import build_lsvc_decode as b

    return b(module, GOP, H, W, dtype=jnp.bfloat16)


def main():
    # FVC_XPROF=<dir>: capture a jax.profiler trace of one timed iteration
    # for xprof/TensorBoard (utils.meters.xprof_trace)
    xprof_dir = os.environ.get("FVC_XPROF", "")
    from fastvideocodec_tpu.models import get_codec_model
    from fastvideocodec_tpu.gop import rollout
    from fastvideocodec_tpu.ops import depth_to_space, space_to_depth

    GOP = 16  # 1 I-frame + 15 P-frames (eval.py:495 fP=15)
    H, W = 1024, 2048

    spec = get_codec_model("LSVC-TPU", dtype=jnp.bfloat16)
    module = spec.module

    key = jax.random.PRNGKey(0)
    # Trained hd checkpoint when shipped (conv weights apply at any
    # resolution); random init only as a flagged fallback — the headline
    # must track the real model (VERDICT round-3 item 10).
    from fastvideocodec_tpu.train.checkpoint import asset_params

    params = asset_params("hd_lsvctpuf2_l2")
    if params is None:
        print("WARNING: no hd checkpoint found; random-init weights",
              file=sys.stderr)
        small = jax.random.uniform(key, (GOP, 256, 256, 3), dtype=jnp.bfloat16)
        params = jax.jit(
            lambda k, g: module.init({"params": k}, g, training=False)
        )(key, small)
    else:
        print("bench weights: assets/hd_lsvctpuf2_l2.npz (trained)",
              file=sys.stderr)

    # Bench frames: trained-corpus-style multi-object motion clips rather
    # than uniform noise, so flow magnitudes / latent statistics are
    # realistic for the trained weights (decode-side latents stay random
    # — they only set compute shapes).
    import numpy as np

    from fastvideocodec_tpu.data.synthetic import synth_gop_multi

    nrng = np.random.default_rng(0)
    gop = jnp.asarray(
        synth_gop_multi(nrng, size=max(H, W), gop=GOP)[:, :H, :W],
        dtype=jnp.bfloat16,
    )

    def run(p, g):
        com, metrics = rollout(spec, p, g, training=False, rng=None)
        # reduce outputs to scalars so the timing loop transfers O(1) bytes
        # but ALL compute stays live
        return jnp.mean(com), metrics["bpp"], metrics["rec_loss"]

    # The axon relay adds a ~40-50 ms dispatch+sync floor per jit call —
    # a third of a GOP's device time at these rates. Scan SCANS distinct
    # GOPs inside ONE jit call (real sequential execution on device, the
    # relay floor amortized), mirroring a server streaming GOPs
    # back-to-back; fn keeps the single-GOP signature for the warmup and
    # the xprof trace.
    SCANS = 5

    def run_many(p, gs):
        def body(_, g):
            return None, run(p, g)
        _, outs = jax.lax.scan(body, None, gs)
        return jax.tree.map(jnp.sum, outs)

    fn = jax.jit(run)
    fn_many = jax.jit(run_many)
    # warmup / compile; host-materialize (block_until_ready can return
    # before the remote compile+execute completes under the axon relay)
    out = fn(params, gop)
    _ = float(out[0])

    if xprof_dir:
        from fastvideocodec_tpu.utils.meters import xprof_trace

        with xprof_trace(xprof_dir):
            out = fn(params, gop)
            _ = float(out[0])
        print(f"xprof trace written to {xprof_dir}", file=sys.stderr)

    iters = 2
    # distinct inputs per iteration AND per scan step: the axon relay
    # memoizes identical (executable, args) executions, which would time
    # as ~0ms (the perturbation must exceed the bf16 ulp or the buffers
    # are bitwise-identical and memoization still hits)
    gop_stacks = [
        jax.block_until_ready(
            jnp.stack(
                [
                    jnp.clip(gop * (0.7 + 0.03 * (i * SCANS + s)), 0, 1)
                    for s in range(SCANS)
                ]
            )
        )
        for i in range(iters)
    ]
    # compile+warm the scan executable outside the timed loop (distinct
    # input so the relay can't replay it for iteration 0)
    warm_stack = jnp.stack([jnp.clip(gop * (0.95 + 0.01 * s), 0, 1) for s in range(SCANS)])
    _ = float(fn_many(params, warm_stack)[0])
    times = []
    vals = []
    for i in range(iters):
        t0 = time.perf_counter()
        out = fn_many(params, gop_stacks[i])
        # under the axon relay, block_until_ready can resolve before remote
        # execution completes; materializing the scalar on host is the only
        # honest sync point
        vals.append(float(out[0]))
        times.append(time.perf_counter() - t0)
    dt = sum(times)
    print(
        f"iters(s, {SCANS} GOPs each): {[round(t, 4) for t in times]} "
        f"recon_sums: {[round(v, 4) for v in vals]}",
        file=sys.stderr,
    )

    frames = (GOP - 1) * SCANS * iters
    encdec_fps = frames / dt if dt > 0 else float("nan")
    print(f"encode+decode: {encdec_fps:.2f} fps", file=sys.stderr)

    # ---- decode-only path (receiver side): mv synthesis + tree MC +
    # hyper + residual synthesis from quantized latents + depth-to-space.
    # Two live scalar outputs (recon + sigma means) make DCE impossible ----
    decode, (mv_q, z_qs, feat_qs) = build_lsvc_decode(module, GOP, H, W)
    s2d = module.s2d
    iframe = gop[0:1]
    iframe_s2d = (
        space_to_depth(iframe, s2d)[0] if s2d > 1 else iframe[0]
    )
    dfn = jax.jit(decode)
    out = dfn(params, iframe_s2d, mv_q, z_qs, feat_qs)
    _ = (float(out[0]), float(out[1]))
    if xprof_dir:
        from fastvideocodec_tpu.utils.meters import xprof_trace

        with xprof_trace(xprof_dir + "_decode"):
            out = dfn(params, iframe_s2d, mv_q, z_qs, feat_qs)
            _ = (float(out[0]), float(out[1]))
        print(f"decode xprof trace in {xprof_dir}_decode", file=sys.stderr)
    # scan-amortized like the encode+decode loop: each scan step decodes
    # with a distinctly scaled mv stream (distinct flows -> distinct halo
    # offsets and synthesis inputs; latents fixed)
    def dec_many(p, i_s2d, mv, zq, fq, scales):
        def body(_, s):
            return None, decode(p, i_s2d, mv * s, zq, fq)
        _, outs = jax.lax.scan(body, None, scales)
        return jax.tree.map(jnp.sum, outs)

    dmany = jax.jit(dec_many)
    warm_scales = jnp.asarray(
        [0.95 + 0.01 * s for s in range(SCANS)], mv_q.dtype
    )
    out = dmany(params, iframe_s2d, mv_q, z_qs, feat_qs, warm_scales)
    _ = (float(out[0]), float(out[1]))
    dts = []
    for i in range(iters):
        scales = jax.block_until_ready(
            jnp.asarray(
                [0.7 + 0.03 * (i * SCANS + s) for s in range(SCANS)],
                mv_q.dtype,
            )
        )
        t0 = time.perf_counter()
        out = dmany(params, iframe_s2d, mv_q, z_qs, feat_qs, scales)
        _ = (float(out[0]), float(out[1]))
        dts.append(time.perf_counter() - t0)
    dec_fps = (GOP - 1) * SCANS * iters / sum(dts)
    print(f"decode-only iters(s, {SCANS} GOPs each): {[round(t, 3) for t in dts]}", file=sys.stderr)

    baseline_fps = 1.0 / 0.0310  # LSVC decode on GTX 1080 Ti, plot_hermes.py:735
    print(
        json.dumps(
            {
                "metric": "lsvc_1080p_gop16_decode_fps",
                "value": round(dec_fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(dec_fps / baseline_fps, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
