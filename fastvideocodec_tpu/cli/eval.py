"""Evaluator CLI (reference eval.py): GOP-based eval over UVG/MCL-JCV
videos writing `{codec}.{dataset}.{evolve}.log` in the 2-line format, plus
x26x anchor evaluation when ffmpeg is present.

Usage:
  python -m fastvideocodec_tpu.cli.eval --codec LSVC-128 \
      --dataset-dir /data/UVG --dataset UVG --level-range 0 8
"""

from __future__ import annotations

import argparse
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from fastvideocodec_tpu.data import VideoDataset
from fastvideocodec_tpu.models import get_codec_model
from fastvideocodec_tpu.train import load_checkpoint
from fastvideocodec_tpu.train.evaluate import evaluate_video
from fastvideocodec_tpu.utils.logs import write_eval_log


def parse_args(argv=None):
    p = argparse.ArgumentParser("fvc-eval")
    p.add_argument("--codec", default="LSVC-128")
    p.add_argument("--dataset", default="UVG")
    p.add_argument("--dataset-dir", required=True)
    p.add_argument("--resolution", type=int, nargs=2, default=(2048, 1024),
                   help="width height (eval.py:495-496 default 2048x1024)")
    p.add_argument("--level-range", type=int, nargs=2, default=(0, 1))
    p.add_argument("--fP", type=int, default=15)
    p.add_argument("--ckpt-dir", default="backup")
    p.add_argument("--evolve", type=int, default=0)
    p.add_argument("--max-gops", type=int, default=0)
    p.add_argument("--task", default="model", choices=["model", "x26x"])
    p.add_argument("--Q", type=int, default=27, help="x26x crf")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--real-bits", action="store_true",
                   help="drive the real bitstream encode+decode: bpp_act, "
                        "separate enc/dec times, net-vs-AC split in aux")
    p.add_argument("--torch-ckpt", default="",
                   help="DVC only: import a reference torch snapshot "
                        "(DVC/snapshot/*.model) via utils.torch_import")
    return p.parse_args(argv)


def eval_x26x(args):
    from fastvideocodec_tpu.anchors import compress_whole_video

    ds = VideoDataset(args.dataset_dir, tuple(args.resolution))
    frames, buf = [], []
    for i in range(len(ds)):
        f, eof = ds[i]
        buf.append(f)
        if eof:
            frames = np.stack(buf)
            psnrs, bpp, enc_t, dec_t = compress_whole_video(
                args.codec, frames, args.Q, gop=args.fP + 1
            )
            write_eval_log(f"{args.codec}.log", args.Q, bpp, enc_t, dec_t, psnrs)
            print(f"{args.codec} Q={args.Q}: bpp {bpp:.4f} psnr {np.mean(psnrs):.2f}")
            buf = []


def main(argv=None):
    args = parse_args(argv)
    if args.task == "x26x":
        eval_x26x(args)
        return
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    gop = args.fP + 1
    for lvl in range(args.level_range[0], args.level_range[1]):
        spec = get_codec_model(args.codec, compression_level=lvl, dtype=dtype)
        ds = VideoDataset(args.dataset_dir, tuple(args.resolution))
        key = jax.random.PRNGKey(0)
        # init params at eval resolution (padded multiple of 64)
        w, h = args.resolution
        h64, w64 = -(-h // 64) * 64, -(-w // 64) * 64
        sample = jnp.zeros((gop, h64, w64, 3), dtype)
        from fastvideocodec_tpu.cli.train import init_params

        params = init_params(spec, sample, key)
        ckpt = f"{args.ckpt_dir}/{args.codec}-{lvl}{spec.loss_type}"
        if args.torch_ckpt:
            from fastvideocodec_tpu.utils.torch_import import (
                load_torch_dvc_checkpoint,
            )

            params = load_torch_dvc_checkpoint(args.torch_ckpt)
            print(f"imported torch snapshot {args.torch_ckpt}")
        else:
            try:
                state = load_checkpoint(ckpt, {"params": params}, prefer_best=True)
                params = state["params"]
                print(f"loaded weights from {ckpt}")
            except FileNotFoundError:
                print(f"WARNING: no checkpoint at {ckpt}; evaluating random init")
        log_path = f"{args.codec}.{args.dataset}.{args.evolve}.log"
        stats = evaluate_video(
            spec, params, ds, gop_size=gop, log_path=log_path, level=lvl,
            max_gops=args.max_gops, real_bits=args.real_bits,
        )
        msg = (
            f"level {lvl}: bpp {stats['bpp']:.4f} psnr {stats['psnr']:.2f} "
            f"(enc {stats['sec_per_frame']*1e3:.1f} / "
            f"dec {stats['dec_sec_per_frame']*1e3:.1f} ms/frame)"
        )
        if args.real_bits:
            msg += (
                f" [bpp_est {stats['bpp_est']:.4f}; AC enc "
                f"{stats['enc_ac_sec_per_frame']*1e3:.1f} / dec "
                f"{stats['dec_ac_sec_per_frame']*1e3:.1f} ms/frame]"
            )
        print(msg)


if __name__ == "__main__":
    main()
