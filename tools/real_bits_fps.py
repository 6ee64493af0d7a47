"""Honest end-to-end real-bits throughput on one TPU chip (VERDICT round-2
item 4): LSVC-TPU at 1024x2048 GOP 16 through the ACTUAL bitstream encode
AND decode — flow + transforms + quantization on device, range coding on
the host, decode==encode identity checked — with the net-vs-AC wall-clock
split. Unlike bench.py (device-graph fps: decode excluding host entropy
decode), every second of host entropy coding is on the bill here.

Weights: assets/hd_lsvctpuf2_l2.npz when present — the round-4 default
config's checkpoint, trained on the 128px multi-object corpus (conv
weights apply at any resolution) — else random init (flagged in the
output).

Usage:  python tools/real_bits_fps.py [--gop 16] [--h 1024] [--w 2048]
        [--reps 3] [--level 2] [--warp exact|native]

--warp native opts the coder into the Pallas warp kernel on BOTH sides
(FVC_CODER_WARP=native; valid for same-device encode+decode — the
identity assert still runs). One mode per process: the jit trace cache
bakes the warp dispatch, so run each mode in its own invocation.

Reference contract: compress_slow/decompress_slow net-vs-AC accounting
(entropy_models.py:97-148); the published numbers live in README.md.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np


def load_hd_params(level: int):
    path = os.path.join(REPO, "fastvideocodec_tpu", "assets",
                        f"hd_lsvctpuf2_l{level}.npz")
    if not os.path.exists(path):
        return None
    data = np.load(path)
    tree: dict = {}
    for k in data.files:
        node = tree
        parts = k.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(data[k].astype(np.float32))
    return tree


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gop", type=int, default=16)
    ap.add_argument("--h", type=int, default=1024)
    ap.add_argument("--w", type=int, default=2048)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--level", type=int, default=2)
    ap.add_argument("--warp", choices=("exact", "native"), default="exact")
    ap.add_argument("--dtype", choices=("f32", "bf16"), default="f32",
                    help="model compute dtype; bf16 matches the bench.py "
                    "flagship headline (and halves the Pallas out-block, "
                    "which XLA's memory-space assignment may place in "
                    "scoped VMEM at B=1)")
    ap.add_argument("--json", default="",
                    help="also append the summary as one JSON line to this "
                    "path (the published REAL_BITS_r{N}.json artifact)")
    args = ap.parse_args()
    os.environ["FVC_CODER_WARP"] = args.warp

    from fastvideocodec_tpu.coder import measure_ac_time
    from fastvideocodec_tpu.coder.video import lsvc_compress, lsvc_decompress
    from fastvideocodec_tpu.data.synthetic import synth_gop_multi
    from fastvideocodec_tpu.models import get_codec_model

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    spec = get_codec_model(
        "LSVC-TPU", compression_level=args.level, dtype=dtype)
    params = load_hd_params(args.level)
    trained = params is not None
    rng = np.random.default_rng(123)
    gop = jnp.asarray(
        synth_gop_multi(rng, size=max(args.h, args.w), gop=args.gop)
        [:, : args.h, : args.w]
    )
    if not trained:
        from functools import partial

        print("WARNING: no hd checkpoint; random init", flush=True)
        params = jax.jit(partial(spec.module.init, training=False))(
            {"params": jax.random.PRNGKey(0)}, gop
        )

    T = args.gop
    P = T - 1
    print(f"LSVC-TPU {'trained(hd)' if trained else 'random'} "
          f"{args.h}x{args.w} GOP{T} level {args.level} "
          f"warp={args.warp}", flush=True)

    # warm-up rep compiles every jitted piece; subsequent reps are honest
    results = []
    for rep in range(args.reps + 1):
        # perturb so the relay can't memoize identical executions
        g = gop * (1.0 + 1e-4 * rep)
        t0 = time.perf_counter()
        with measure_ac_time() as enc_ac:
            streams, recon, bits = lsvc_compress(spec, params, g)
        t_enc = time.perf_counter() - t0
        t0 = time.perf_counter()
        with measure_ac_time() as dec_ac:
            dec = lsvc_decompress(spec, params, g[0], streams, P)
        t_dec = time.perf_counter() - t0
        ident = bool(jnp.all(dec == recon))
        assert ident, "decode != encode recon"
        bpp = bits / (P * args.h * args.w)
        if rep == 0:
            print(f"  warm-up: enc {t_enc:.2f}s dec {t_dec:.2f}s "
                  f"bpp {bpp:.4f}", flush=True)
            continue
        results.append((t_enc, t_dec, bpp, enc_ac["seconds"], dec_ac["seconds"]))
        print(f"  rep {rep}: enc {t_enc:.2f}s ({P / t_enc:.1f} fps, "
              f"AC {enc_ac['seconds']:.2f}s)  "
              f"dec {t_dec:.2f}s ({P / t_dec:.1f} fps, "
              f"AC {dec_ac['seconds']:.2f}s)  bpp {bpp:.4f}  "
              f"identity OK", flush=True)

    enc = min(r[0] for r in results)
    dec = min(r[1] for r in results)
    both = min(r[0] + r[1] for r in results)
    print(
        f"real-bits fps (best of {args.reps}): encode {P / enc:.1f}, "
        f"decode {P / dec:.1f}, encode+decode {P / both:.1f} "
        f"(bpp {results[-1][2]:.4f}, trained={trained})",
        flush=True,
    )
    if args.json:
        import json

        best = min(results, key=lambda r: r[0] + r[1])
        with open(args.json, "a") as f:
            f.write(json.dumps({
                "tool": "real_bits_fps", "warp": args.warp,
                "dtype": args.dtype, "h": args.h, "w": args.w, "gop": T,
                "level": args.level, "trained": trained,
                "enc_fps": round(P / enc, 2), "dec_fps": round(P / dec, 2),
                "encdec_fps": round(P / both, 2),
                "enc_s": round(best[0], 3), "dec_s": round(best[1], 3),
                "enc_ac_s": round(best[3], 3), "dec_ac_s": round(best[4], 3),
                "bpp": round(best[2], 4), "identity": True,
            }) + "\n")


if __name__ == "__main__":
    main()
