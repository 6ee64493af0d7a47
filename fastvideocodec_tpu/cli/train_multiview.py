"""Multi-view MCVC trainer CLI (reference train_multiview.py): Vimeo-style
pretraining is handled by cli.train; this driver covers the MCVC-specific
loops — per-category online fine-tuning (OLFT) with touch-up labels and
bandwidth accounting, resilience masking, and the category-keyed checkpoint
naming (train_multiview.py:107-303, 570-894).

Usage:
  python -m fastvideocodec_tpu.cli.train_multiview --dataset-dir /data/MMPTRACKING \
      --codec MCVC-IA-OLFT --category 0 --steps 200
"""

from __future__ import annotations

import argparse
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from fastvideocodec_tpu.data import MultiViewVideoDataset
from fastvideocodec_tpu.gop import rollout
from fastvideocodec_tpu.models import get_codec_model, sample_view_mask
from fastvideocodec_tpu.train import (
    TrainConfig,
    load_checkpoint,
    make_train_step,
    save_checkpoint,
)
from fastvideocodec_tpu.train.olft import touchup_bits
from fastvideocodec_tpu.utils import AverageMeter
from fastvideocodec_tpu.utils.logs import write_eval_log


def parse_args(argv=None):
    p = argparse.ArgumentParser("fvc-train-multiview")
    p.add_argument("--codec", default="MCVC-IA-OLFT")
    # --task speed runs on synthetic frames and needs no dataset
    p.add_argument("--dataset-dir", default="")
    p.add_argument("--category", type=int, default=0)
    p.add_argument("--compression-level", type=int, default=2)
    p.add_argument("--loss-type", default="P", choices=["P", "M"])
    p.add_argument("--gop", type=int, default=16)
    p.add_argument("--steps", type=int, default=500)
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--resilience", type=int, default=0)
    p.add_argument("--force-resilience", type=int, default=-1)
    p.add_argument("--sample-ratio", type=float, default=0.1)
    p.add_argument("--c2s-ratio", type=float, default=1.0)
    p.add_argument("--sample-interval", type=int, default=0)
    p.add_argument("--max-pool-size", type=int, default=0)
    p.add_argument("--ckpt-dir", default="backup")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--debug", action="store_true", help="exit after 10 batches")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--frame-size", type=int, default=256)
    p.add_argument("--task", default="train",
                   choices=["train", "speed", "x26x", "eval"],
                   help="speed: enc/dec fps vs view count "
                        "(train_multiview.py:535-552); x26x: anchor "
                        "side-by-side writing {codec}.avg.log (:345-390); "
                        "eval: multicam model eval per level writing "
                        "{codec}.avg.log (:408-416)")
    p.add_argument("--level-range", type=int, nargs=2, default=(0, 4))
    p.add_argument("--max-views", type=int, default=6, help="speed-test sweep")
    p.add_argument("--Q", type=int, default=27, help="x26x crf")
    p.add_argument("--frame-comb", type=int, default=0,
                   help="x26x multiview frame layout 0-3")
    p.add_argument("--log-key", default="",
                   help="per-experiment log family key (cat/c2s/sr/si/mps/"
                        "dr/sisr/ablation/longterm): results append to "
                        "{codec}.{key}.log as '<value>,<level>,<bpp>,<psnr>,"
                        "<completeness>' rows, the filenames/format the "
                        "reference's MCVC tooling parses "
                        "(train_multiview.py:603-894)")
    p.add_argument("--log-key-value", default="",
                   help="value of the swept variable recorded in the per-key"
                        " log row (defaults to the category id)")
    p.add_argument("--real-bits", action="store_true",
                   help="eval task: drive the actual MCVC bitstream encode "
                        "AND decode (masked-view real coding); logs bpp_act "
                        "with bpp_est/enc_t/dec_t as aux fields")
    p.add_argument("--probe-bw-limit", type=float, default=0.0,
                   help=">0: probe the OLFT touch-up rate (bits/s) and set "
                        "the frame sampling interval to fit this budget")
    return p.parse_args(argv)


def speed_test(args):
    """Encode(+decode) fps vs number of views on synthetic 256x256 bf16
    inputs (reference speed-test mode + its measured table,
    train_multiview.py:535-552; anchor: 140-284 fps server decode across
    1-6 views, plot_mcvc.py:713-722).

    bf16 like every other published speed number (speed_sweep/bench);
    honest relay timing: inputs are rescaled between iterations (the
    axon relay memoizes identical executions) and the rollout reduces to
    scalars that are host-materialized (block_until_ready on device
    buffers can return early)."""
    key = jax.random.PRNGKey(args.seed)
    rows = []
    for nv in range(1, args.max_views + 1):
        spec = get_codec_model(args.codec if "MCVC" in args.codec else "MCVC-IA",
                               num_views=nv, dtype=jnp.bfloat16)
        gop = jax.random.uniform(
            key, (args.gop, nv, 256, 256, 3), dtype=jnp.bfloat16)
        mask = jnp.ones((nv,))
        params = jax.jit(partial(spec.module.init, training=False))(
            {"params": key}, gop[:2], mask
        )

        def run(g):
            out, m = rollout(spec, params, g, training=False, rng=None,
                             mask=mask)
            return jnp.mean(out), jnp.mean(m["bpp_est"])

        jrun = jax.jit(run)
        _ = [float(v) for v in jrun(gop)]  # compile + warm
        ts = []
        for i in range(3):
            g = jax.block_until_ready(gop * (0.7 + 0.1 * i))
            t0 = time.perf_counter()
            _ = [float(v) for v in jrun(g)]
            ts.append(time.perf_counter() - t0)
        spf = sorted(ts)[1] / args.gop
        rows.append((nv, spf))
        print(f"views={nv}: {spf*1e3:.2f} ms/frame ({1/spf:.1f} fps)", flush=True)
    with open(f"{args.codec}.speed.log", "a") as f:
        for nv, spf in rows:
            f.write(f"{nv},{spf:.6f}\n")


def x26x_multicam(args):
    """x26x anchor side-by-side on the multiview dataset: stitches views per
    --frame-comb layout, codes with ffmpeg, appends 'cat,lvl,bpp,psnr,ssim'
    lines to {codec}.avg.log (reference train_multiview.py:345-390)."""
    from fastvideocodec_tpu.anchors import (
        compress_whole_video,
        have_ffmpeg,
        multiview_frame_layout,
    )

    if not have_ffmpeg():
        raise SystemExit("ffmpeg not available for x26x anchors")
    ds = MultiViewVideoDataset(
        args.dataset_dir, args.category, gop_size=args.gop, split="test",
        frame_size=args.frame_size,
    )
    clip = np.stack([np.asarray(ds[i]) for i in range(min(2, len(ds)))])
    clip = clip.reshape((-1,) + clip.shape[2:])  # [F, V, H, W, 3]
    frames, gop_eff = multiview_frame_layout(clip, args.frame_comb,
                                             gop=args.gop)
    name = "x264" if "264" in args.codec else "x265"
    psnrs, bpp, enc_t, dec_t = compress_whole_video(name, frames, args.Q,
                                                    gop=gop_eff)
    psnr = float(np.mean(psnrs))
    with open(f"{args.codec}.avg.log", "a") as f:
        f.write(
            f"{args.category},{args.compression_level},{bpp:.4f},{psnr:.4f},0.0\n"
        )
    print(f"x26x cat {args.category}: bpp {bpp:.4f} psnr {psnr:.2f} "
          f"(enc {enc_t*1e3:.1f} / dec {dec_t*1e3:.1f} ms/frame)")


def eval_multicam(args):
    """Model-based multicam eval (reference static_simulation_model_multicam,
    train_multiview.py:408-416): per level, run the jitted GOP rollout over
    the test split and append 'cat,lvl,bpp,psnr,completeness' to
    {codec}.avg.log — the table the network-trace simulation consumes.

    --real-bits drives the masked-view real bitstream encode AND decode
    (mcvc_compress_gop/mcvc_decompress_gop): bpp becomes bpp_act (coded
    bytes / all pixels, matching the reference's multicam bit accounting,
    train_multiview.py:161-210), PSNR is measured on the decoded frames
    over alive views, and the row gains ',bpp_est,enc_t,dec_t' aux fields."""
    ds = MultiViewVideoDataset(
        args.dataset_dir, args.category, gop_size=args.gop, split="test",
        frame_size=args.frame_size,
    )
    V = ds.num_views
    key = jax.random.PRNGKey(args.seed)
    host_rng = np.random.default_rng(args.seed)
    for lvl in range(args.level_range[0], args.level_range[1]):
        spec = get_codec_model(
            args.codec, compression_level=lvl, num_views=V,
            resilience=args.resilience,
        )
        sample = jnp.asarray(ds[0])
        mask = jnp.asarray(
            sample_view_mask(
                host_rng, 1, V, max_failed=args.resilience,
                force_resilience=args.force_resilience, training=False,
            )
        )
        params = jax.jit(partial(spec.module.init, training=False))(
            {"params": key}, sample[:2], mask
        )
        ckpt = (f"{args.ckpt_dir}/{args.codec}-{lvl}"
                f"{args.loss_type}-{ds.category}")
        have_ckpt = True
        try:
            state = load_checkpoint(ckpt, {"params": params}, prefer_best=True)
            params = state["params"]
        except FileNotFoundError:
            have_ckpt = False
            print(f"WARNING: no checkpoint at {ckpt}; random init — "
                  "row will be flagged untrained")
        jroll = jax.jit(partial(rollout, spec, training=False, rng=None))
        psnr_m, bpp_m, comp_m = AverageMeter(), AverageMeter(), AverageMeter()
        bppe_m, enc_m, dec_m = AverageMeter(), AverageMeter(), AverageMeter()
        n = min(len(ds), 10 if args.debug else len(ds))
        if n == 0:
            raise SystemExit(
                f"test split of category {ds.category} has no full GOP "
                f"(need > {args.gop} frames after the 80/20 split)"
            )
        alive = np.asarray(mask) > 0
        for i in range(n):
            gop = jnp.asarray(ds[i])
            _, m = jroll(params, gop, mask=mask)
            comp_m.update(float(m.get("completeness", 1.0)))
            bppe_m.update(float(jnp.mean(m["bpp_est"])))
            if args.real_bits:
                from fastvideocodec_tpu.train.evaluate import _real_bits_gop

                p_rec, key_rec, bits, enc_t, dec_t, _, _ = _real_bits_gop(
                    spec, params, gop, mask=mask
                )
                recon = np.concatenate([key_rec[None], p_rec], axis=0)
                raw = np.asarray(gop)
                mse = np.mean((recon[:, alive] - raw[:, alive]) ** 2)
                psnr_m.update(10 * np.log10(1.0 / max(float(mse), 1e-12)))
                T = raw.shape[0]
                bpp_m.update(bits / (T * V * raw.shape[2] * raw.shape[3]))
                enc_m.update(enc_t / T)
                dec_m.update(dec_t / T)
            else:
                psnr_m.update(float(jnp.mean(m["psnr"])))
                bpp_m.update(float(jnp.mean(m["bpp_est"])))
        row = (f"{args.category},{lvl},{bpp_m.avg:.4f},{psnr_m.avg:.4f},"
               f"{comp_m.avg:.4f}")
        if args.real_bits:
            row += f",{bppe_m.avg:.4f},{enc_m.avg:.4f},{dec_m.avg:.4f}"
        if not have_ckpt:
            row += ",untrained"
        with open(f"{args.codec}.avg.log", "a") as f:
            # category ID (int), matching the reference's avg.log format
            # and analysis.read_avg_log
            f.write(row + "\n")
        if args.log_key:
            val = args.log_key_value or str(args.category)
            with open(f"{args.codec}.{args.log_key}.log", "a") as f:
                f.write(f"{val},{lvl},{bpp_m.avg:.4f},{psnr_m.avg:.4f},"
                        f"{comp_m.avg:.4f}\n")
        print(f"eval cat {ds.category} lvl {lvl}: bpp {bpp_m.avg:.4f} "
              f"psnr {psnr_m.avg:.2f} completeness {comp_m.avg:.2f}"
              + (f" enc {enc_m.avg*1e3:.1f}ms dec {dec_m.avg*1e3:.1f}ms"
                 if args.real_bits else ""))


def main(argv=None):
    args = parse_args(argv)
    if args.task == "speed":
        return speed_test(args)
    if not args.dataset_dir:
        raise SystemExit("--dataset-dir is required for this task")
    if args.task == "x26x":
        return x26x_multicam(args)
    if args.task == "eval":
        return eval_multicam(args)
    if not args.dataset_dir:
        raise SystemExit("--dataset-dir is required for this task")
    train_ds = MultiViewVideoDataset(
        args.dataset_dir, args.category, gop_size=args.gop, split="train",
        frame_size=args.frame_size, c2s_ratio=args.c2s_ratio,
        sample_interval=args.sample_interval, max_pool_size=args.max_pool_size,
    )
    V = train_ds.num_views
    spec = get_codec_model(
        args.codec, loss_type=args.loss_type,
        compression_level=args.compression_level,
        num_views=V, resilience=args.resilience,
    )
    olft = spec.extras.get("olft", False)
    key = jax.random.PRNGKey(args.seed)
    host_rng = np.random.default_rng(args.seed)

    sample = jnp.asarray(train_ds[0])  # [GOP, V, S, S, 3]
    mask0 = jnp.ones((V,))
    params = jax.jit(partial(spec.module.init, training=False))(
        {"params": key}, sample[:2], mask0
    )

    # category-keyed checkpoint name (train_multiview.py:292-303)
    ckpt_dir = (
        f"{args.ckpt_dir}/{args.codec}-{args.compression_level}"
        f"{args.loss_type}-{train_ds.category}"
    )
    cfg = TrainConfig(learning_rate=args.lr)
    if olft:
        from fastvideocodec_tpu.train.olft import make_olft_step

        init_fn, step_fn = make_olft_step(spec, cfg, args.sample_ratio)
    else:
        init_fn, step_fn = make_train_step(spec, cfg)
    opt_state = init_fn(params)
    if args.resume:
        try:
            state = load_checkpoint(ckpt_dir, {"params": params, "opt_state": opt_state})
            params, opt_state = state["params"], state["opt_state"]
        except FileNotFoundError:
            pass

    jstep = jax.jit(step_fn)
    jroll = jax.jit(partial(rollout, spec, training=False, rng=None))

    if olft and args.probe_bw_limit > 0:
        from fastvideocodec_tpu.train.olft import probe_sample_interval

        interval = probe_sample_interval(
            spec, params, train_ds, args.sample_ratio, args.probe_bw_limit,
            rng=host_rng,
        )
        train_ds.sample_interval = interval
        print(f"bandwidth probe: sample_interval={interval} "
              f"(budget {args.probe_bw_limit/1e6:.2f} Mbps)")

    psnr_m, bpp_m, touch_m = AverageMeter(), AverageMeter(), AverageMeter()
    progress_log = f"{args.codec}.{train_ds.category}.log"
    t0 = time.time()
    for step in range(args.steps):
        pool = train_ds.sample(step)
        idx = int(host_rng.integers(0, max(1, pool - args.gop)))
        gop = jnp.asarray(train_ds[idx])  # [GOP, V, S, S, 3]
        mask = jnp.asarray(
            sample_view_mask(
                host_rng, 1, V, max_failed=args.resilience,
                force_resilience=args.force_resilience,
            )
        )
        key, sk = jax.random.split(key)
        if olft:
            # Reference OLFT semantics (models.py:2318-2321;
            # train_multiview.py:171-205): the step consumes RAW frames,
            # builds the touch-up labels inside from the detached x_ref
            # chain, and supervises the recon against them with loss =
            # r*mse (no estimated-bpp term).
            params, opt_state, metrics = jstep(params, opt_state, gop, sk, mask)
            refs = metrics.pop("touch_refs")
            labels = metrics.pop("touch_labels")
            masks = metrics.pop("touch_mask")
            bits = touchup_bits(
                np.asarray(refs), np.asarray(labels), np.asarray(masks)
            )
            # bandwidth accounting: touchup_bits returns zlib BYTES; bpp =
            # bytes*8 / pixels, pixels = GOP*V*S*S (gop.size counts the
            # channel axis, hence // 3) — models.py:2218-2233
            pixels = gop.size // 3
            touch_m.update(bits * 8 / pixels)
        else:
            params, opt_state, metrics = jstep(params, opt_state, gop, sk, mask)
        psnr_m.update(float(metrics["psnr"]))
        bpp_m.update(float(metrics["bpp"]))
        if step % 20 == 0:
            print(
                f"step {step}/{args.steps} psnr {psnr_m.avg:.2f} "
                f"bpp {bpp_m.avg:.4f} touch_bpp {touch_m.avg:.4f} "
                f"({(time.time()-t0)/(step+1):.2f}s/it)",
                flush=True,
            )
        if args.debug and step >= 9:
            break
    save_checkpoint(ckpt_dir, {"params": params, "opt_state": opt_state}, best=True)
    write_eval_log(
        progress_log, args.compression_level, bpp_m.avg, 0.0, 0.0,
        [psnr_m.avg], aux=(touch_m.avg,),
    )
    if args.log_key:
        # the reference's per-experiment log family ({codec}.{key}.log,
        # train_multiview.py:603-894): '<swept value>,<level>,...' CSV rows
        val = args.log_key_value or str(train_ds.category)
        with open(f"{args.codec}.{args.log_key}.log", "a") as f:
            f.write(f"{val},{args.compression_level},{bpp_m.avg:.4f},"
                    f"{psnr_m.avg:.4f},{touch_m.avg:.4f}\n")
    print(f"done: psnr {psnr_m.avg:.2f} bpp {bpp_m.avg:.4f} -> {ckpt_dir}")


if __name__ == "__main__":
    main()
