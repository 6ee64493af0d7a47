"""Regenerate the tiny golden-RD checkpoints shipped in assets/.

tests/test_rd.py ships trained miniature checkpoints per codec family
(assets/tiny_{family}_l{level}.npz) and asserts monotone real-bitstream
bpp/PSNR across lambda levels on a held-out clip.  This tool reproduces
those assets on one TPU chip with the recipes documented in
assets/TINY_RD.md (synthetic 64x64 motion clips; loss r*mse + bpp + aux;
the reference lambda table models.py:72-76 keyed by compression_level).

Usage:
    python tools/train_tiny.py rlvc dvc base mcvc  [--steps N] [--out DIR]

The data generators live in fastvideocodec_tpu/data/synthetic.py so the
training distribution and the regressions' held-out clips (seed 123 —
never drawn here; training uses seed 0) stay a single source of truth.

The *_hd families train the scaled rung (128x128, GOP 8, multi-object
clips) at FULL reference channel widths — LSVC-128 vs LSVC-TPU, the
flagship RD head-to-head (assets/hd_{lsvc128,lsvctpu}_l{0,2,4}.npz).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from fastvideocodec_tpu.models import get_codec_model
from fastvideocodec_tpu.models.mcvc import sample_view_mask
from fastvideocodec_tpu.ops import bits_estimate
from fastvideocodec_tpu.train import TrainConfig, make_train_step
from fastvideocodec_tpu.train.trainer import make_optimizer

from fastvideocodec_tpu.data.synthetic import (
    synth_gop,
    synth_gop_lowrate,
    synth_gop_multi,
)

from test_rd import TestGoldenRDMCVC  # noqa: E402

ASSETS = os.path.join(REPO, "fastvideocodec_tpu", "assets")

# per-family recipe: (spec factory, lambda levels, steps, gop generator)
# tiny rung: 64x64 GOP 4 single-motion clips; hd rung: 128x128 GOP 8
# multi-object clips with real motion boundaries (data/synthetic.py) at
# FULL reference channel widths — the flagship-vs-parity head-to-head
# (VERDICT round-2 item 2) and the one-rung-up RD evidence (item 9).
_tiny_gen = synth_gop
_hd_gen = lambda rng: synth_gop_multi(rng, size=128, gop=8)

FAMILIES = {
    "lsvctpu": (lambda lvl: get_codec_model(
        "LSVC-TPU-TINY", compression_level=lvl), (0, 2, 4), 800, _tiny_gen),
    "rlvc": (lambda lvl: get_codec_model("RLVC-TINY", compression_level=lvl),
             (0, 2, 4), 800, _tiny_gen),
    "dvc": (lambda lvl: get_codec_model("DVC-TINY", compression_level=lvl),
            (0, 2, 4), 800, _tiny_gen),
    "base": (lambda lvl: get_codec_model("Base-ER-TINY", compression_level=lvl),
             (0, 2, 4), 800, _tiny_gen),
    # SSF-TPU at miniature scale: the Vesper-speed variant's RD evidence
    # (golden test compares it to the stock SSF-TINY curve). Round 5:
    # the s2d PIPELINE + pyramid-volume config — retrained whenever the
    # prediction operator changes.
    "ssftpu": (lambda lvl: get_codec_model(
        "SSF-TPU-TINY", compression_level=lvl), (0, 2, 4), 800, _tiny_gen),
    # ELFVC-SP-TPU at miniature scale (VERDICT r4 item 4): the
    # s2d-pipeline Vesper variant, staged-trained like tiny_elfvc;
    # golden test compares matched-rate quality vs the stock
    # tiny_elfvc curve (lambdas 0/3/6 — the spread tiny_elfvc needed).
    "elfvctpu": (lambda lvl: get_codec_model(
        "ELFVC-SP-TPU-TINY", sp_stage=2, compression_level=lvl),
        (0, 3, 6), 900, _tiny_gen),
    "mcvc": (lambda lvl: get_codec_model(
        "MCVC-IA-TINY", num_views=3, compression_level=lvl), (0, 3, 6), 1200,
        None),
    # 3000 const-LR steps: the round-3 recipe ablation measured const
    # 1e-4 ahead of the steps//4-halving decay at this rung (the models
    # are still in fast descent; the decay locks them in early), and both
    # models keep improving well past 1500 steps.
    "lsvc128_hd": (lambda lvl: get_codec_model(
        "LSVC-128", compression_level=lvl), (0, 2, 4), 3000, _hd_gen),
    # 'LSVC-TPU-RW' = the round-3 rigid s2d-warp config; its assets keep
    # the hd_lsvctpu_* names (the round-4 default renamed the semantics:
    # plain LSVC-TPU now trains the full-res-flow config = lsvctpuf2_hd).
    "lsvctpu_hd": (lambda lvl: get_codec_model(
        "LSVC-TPU-RW", compression_level=lvl), (0, 2, 4), 3000, _hd_gen),
    # Half-res-flow ablation: full-res MC warp with a flow field
    # bilinearly upsampled from the half-res mv decoder output — the
    # middle rung of the round-4 warp attribution (rigid +26.1% -> this
    # +10.8% -> full-res flow +6.1%). The shipped hd_lsvctpuf_* assets
    # are THIS config; '-HF' is its registry name (the old name '-F' now
    # aliases the full-res-flow default and would silently train the
    # wrong rung — ADVICE r4).
    "lsvctpuf_hd": (lambda lvl: get_codec_model(
        "LSVC-TPU-HF", compression_level=lvl), (0, 2, 4), 3000, _hd_gen),
    # '-F2' = '-F' + decoder-native full-res flow (polyphase_factor=4):
    # prices the bilinear-upsampled half-res flow term of the RD gap.
    "lsvctpuf2_hd": (lambda lvl: get_codec_model(
        "LSVC-TPU-F2", compression_level=lvl), (0, 2, 4), 3000, _hd_gen),
    # '-WT' = default warp semantics + WarpNetTPU(stride-2, 128-wide)
    # MC refinement instead of the reference-shape U-net: the fps
    # candidate for VERDICT round-3 item 2 — RD must be priced before it
    # can become the default.
    "lsvctpuwt_hd": (lambda lvl: get_codec_model(
        "LSVC-TPU-WT", compression_level=lvl), (0, 2, 4), 3000, _hd_gen),
    # decode-headroom candidates (VERDICT r4 item 5): the space between
    # the reference-shape U-net and the rejected '-WT' — each priced at
    # the standard 128px/3000-step rung before any default change.
    "lsvctpuhu_hd": (lambda lvl: get_codec_model(
        "LSVC-TPU-HU", compression_level=lvl), (0, 2, 4), 3000, _hd_gen),
    "lsvctpuqu_hd": (lambda lvl: get_codec_model(
        "LSVC-TPU-QU", compression_level=lvl), (0, 2, 4), 3000, _hd_gen),
    # the raised golden rung (VERDICT round-3 item 7): the flagship pair
    # one resolution step up (192px, GOP 8, same corpus family) — tests
    # the 'gap shrinks with resolution' hypothesis with a measured
    # BD-rate trend across 128 -> 192 px.
    "lsvc128_192": (lambda lvl: get_codec_model(
        "LSVC-128", compression_level=lvl), (0, 2, 4), 1500,
        lambda rng: synth_gop_multi(rng, size=192, gop=8)),
    "lsvctpu_192": (lambda lvl: get_codec_model(
        "LSVC-TPU", compression_level=lvl), (0, 2, 4), 1500,
        lambda rng: synth_gop_multi(rng, size=192, gop=8)),
    # the LOW-RATE golden rung (VERDICT r4 item 3): the same multi-object
    # scene structure, noise-free + heavily smoothed, so the trained
    # points land in the reference's operating regime (bpp 0.1-0.8 at
    # >=30 dB) where zero-heavy latents stress the entropy stack's CDF
    # tails and escape path. Full reference widths, 3000-step recipe.
    "lsvc128_lr": (lambda lvl: get_codec_model(
        "LSVC-128", compression_level=lvl), (0, 2, 4), 3000,
        synth_gop_lowrate),
    "lsvctpu_lr": (lambda lvl: get_codec_model(
        "LSVC-TPU", compression_level=lvl), (0, 2, 4), 3000,
        synth_gop_lowrate),
    # SSF at the low-rate rung (miniature widths; 64px GOP4 keeps the
    # sequential scan cheap) — the third family the VERDICT item names
    "ssf_lr": (lambda lvl: get_codec_model(
        "SSF-TINY", compression_level=lvl), (0, 2, 4), 800,
        lambda rng: synth_gop_lowrate(rng, size=64, gop=4)),
    # the reference operating point, one rung closer: 256x256 GOP 16
    # (VERDICT round-2 item 9 — eval runs at 2048x1024 GOP 16,
    # eval.py:495-496; this is the largest rung this environment's
    # synthetic corpus supports)
    "lsvctpu256_hd": (lambda lvl: get_codec_model(
        "LSVC-TPU", compression_level=lvl), (0, 2, 4), 1000,
        lambda rng: synth_gop_multi(rng, size=256, gop=16)),
}


def flatten_f16(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(flatten_f16(v, key + "/"))
        else:
            out[key] = np.asarray(v).astype(np.float16)
    return out


def train_single_view(spec, steps: int, seed: int = 0, gen=synth_gop,
                      decay: bool = False, r_bpp: float = 1.0):
    """RLVC/DVC/Base recipe: make_train_step over the per-family rollout
    (Base-ER with the soft2hard three-pass schedule, models.py:318-344).

    ``decay=True`` swaps the constant 1e-4 for a stepped exponential decay
    (halving every steps/4, floor 1e-5) — the reference's per-epoch LR
    decay (train.py:403-409) mapped onto a fixed step budget; the hd-rung
    runs need the tail LR to reach an RD operating point."""
    # r_bpp > 1 re-weights the rate term (equivalently scales the whole
    # lambda ladder down by r_bpp) — the low-rate rung's knob: the
    # standard ladder's estimated-rate floor sits at ~1.3 bpp after 3000
    # steps even on the clean corpus (the factorized EBs collapse slowly)
    cfg = TrainConfig(
        learning_rate=1e-4,
        r_bpp=r_bpp,
        soft2hard=getattr(spec.module, "use_er", False),
    )
    from fastvideocodec_tpu.cli.train import init_params

    optimizer = None
    if decay:
        sched = optax.exponential_decay(
            1e-4, transition_steps=max(steps // 4, 1), decay_rate=0.5,
            staircase=True, end_value=1e-5)
        optimizer = make_optimizer(cfg, learning_rate=sched)

    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    gop0 = jnp.asarray(gen(rng))
    params = init_params(spec, gop0, key)
    init_fn, step_fn = make_train_step(spec, cfg, optimizer=optimizer)
    opt_state = init_fn(params)

    # The chip is reached over a per-call RPC tunnel, so one jit call per
    # step is latency-bound: scan CHUNK optimizer steps per call instead.
    CHUNK = 25

    @jax.jit
    def multi_step(p, st, gops, keys):
        def body(carry, inp):
            p_, st_ = carry
            g, k = inp
            p_, st_, m = step_fn(p_, st_, g, k)
            return (p_, st_), m
        (p, st), ms = jax.lax.scan(body, (p, st), (gops, keys))
        return p, st, jax.tree_util.tree_map(lambda x: x[-1], ms)

    t0 = time.time()
    for s in range(0, steps, CHUNK):
        n = min(CHUNK, steps - s)
        gops = jnp.stack([jnp.asarray(gen(rng)) for _ in range(n)])
        key, *sks = jax.random.split(key, n + 1)
        if n != CHUNK:  # tail chunk would retrace; run it stepwise
            jstep = jax.jit(step_fn)
            for i in range(n):
                params, opt_state, m = jstep(params, opt_state, gops[i], sks[i])
        else:
            params, opt_state, m = multi_step(
                params, opt_state, gops, jnp.stack(sks))
        print(
            f"  step {s + n - 1:4d} loss {float(m['loss']):9.2f} "
            f"psnr {float(m['psnr']):6.2f} bpp {float(m['bpp']):6.3f} "
            f"({time.time() - t0:.0f}s)", flush=True,
        )
    return params


def train_ssf(spec, steps: int, seed: int = 0, gen=synth_gop,
              r_bpp: float = 1.0):
    """SSF-family recipe (assets/TINY_RD.md tiny_ssf): loss r*mse + bpp +
    aux over the FULL __call__ chain — keyframe img_hyperprior included,
    since the real-bits ssf_compress_gop codes frame 0 through the learned
    image codec."""
    r = spec.r
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    gop0 = jnp.asarray(gen(rng))[:, None]  # [T, B=1, H, W, 3]
    params = jax.jit(
        lambda k, g: spec.module.init({"params": k}, g, training=False)
    )(key, gop0)
    cfg = TrainConfig(learning_rate=1e-4)
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)

    def loss_fn(p, gop, rng_):
        recons, liks = spec.module.apply(p, gop, training=True, rng=rng_)
        denom = gop.shape[2] * gop.shape[3]
        bpp = sum(
            bits_estimate(lik["y"]) + bits_estimate(lik["z"])
            for d in liks for lik in d.values()
        ) / (denom * gop.shape[0])
        mse = jnp.mean((recons - gop) ** 2)
        aux = spec.module.apply(p, method="aux_loss")
        loss = r * mse * gop.shape[0] + r_bpp * bpp * gop.shape[0] + aux
        return loss, {"loss": loss, "mse": mse, "bpp": bpp}

    def jstep(p, st, gop, rng_):
        (_, m), grads = jax.value_and_grad(loss_fn, has_aux=True)(p, gop, rng_)
        updates, st = tx.update(grads, st, p)
        return optax.apply_updates(p, updates), st, m

    CHUNK = 25  # amortize the per-call RPC latency of the tunneled chip

    @jax.jit
    def multi_step(p, st, gops, keys):
        def body(carry, inp):
            p_, st_ = carry
            g, k = inp
            p_, st_, m = jstep(p_, st_, g, k)
            return (p_, st_), m
        (p, st), ms = jax.lax.scan(body, (p, st), (gops, keys))
        return p, st, jax.tree_util.tree_map(lambda x: x[-1], ms)

    t0 = time.time()
    jstep1 = jax.jit(jstep)
    for s in range(0, steps, CHUNK):
        n = min(CHUNK, steps - s)
        gops = jnp.stack([jnp.asarray(gen(rng))[:, None] for _ in range(n)])
        key, *sks = jax.random.split(key, n + 1)
        if n != CHUNK:
            for i in range(n):
                params, opt_state, m = jstep1(params, opt_state, gops[i], sks[i])
        else:
            params, opt_state, m = multi_step(
                params, opt_state, gops, jnp.stack(sks))
        psnr = 10 * np.log10(1.0 / max(float(m["mse"]), 1e-12))
        print(
            f"  step {s + n - 1:4d} loss {float(m['loss']):9.2f} "
            f"psnr {psnr:6.2f} bpp {float(m['bpp']):6.3f} "
            f"({time.time() - t0:.0f}s)", flush=True,
        )
    return params


def train_elfvc(spec, steps: int, seed: int = 0, gen=synth_gop):
    """ELFVC-SP staged recipe (assets/TINY_RD.md tiny_elfvc; reference
    optim_parameters-by-spstage, models.py:2026-2078): steps default-stage
    Adam(1e-4) over all params (SP active), then steps//9 each of spstage
    0/1/2 through make_elfvc_stage_optimizer's frozen-group masking. Loss
    r*mse + bpp + ||pred_err||_2 + aux over the FULL __call__ chain."""
    from fastvideocodec_tpu.train import make_elfvc_stage_optimizer

    r = spec.r
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    gop0 = jnp.asarray(gen(rng))[:, None]
    params = jax.jit(
        lambda k, g: spec.module.init({"params": k}, g, training=False)
    )(key, gop0)
    cfg = TrainConfig(learning_rate=1e-4)

    def loss_fn(p, gop, rng_):
        recons, liks = spec.module.apply(p, gop, training=True, rng=rng_)
        denom = gop.shape[2] * gop.shape[3]
        bpp = 0.0
        pred_err = 0.0
        for d in liks:
            for name in ("keyframe", "motion", "residual"):
                if name in d:
                    bpp = bpp + (
                        bits_estimate(d[name]["y"]) + bits_estimate(d[name]["z"])
                    )
            for pe in d.get("pred_err", []):
                pred_err = pred_err + jnp.sqrt(jnp.sum(pe ** 2))
        bpp = bpp / (denom * gop.shape[0])
        mse = jnp.mean((recons - gop) ** 2)
        aux = spec.module.apply(p, method="aux_loss")
        loss = r * mse * gop.shape[0] + bpp * gop.shape[0] + pred_err + aux
        return loss, {"loss": loss, "mse": mse, "bpp": bpp}

    def run_stage(params, tx, n, key, label):
        opt_state = tx.init(params)

        def jstep(p, st, gop, rng_):
            (_, m), grads = jax.value_and_grad(loss_fn, has_aux=True)(p, gop, rng_)
            updates, st = tx.update(grads, st, p)
            return optax.apply_updates(p, updates), st, m

        CHUNK = 25

        @jax.jit
        def multi_step(p, st, gops, keys):
            def body(carry, inp):
                p_, st_ = carry
                g, k = inp
                p_, st_, m = jstep(p_, st_, g, k)
                return (p_, st_), m
            (p, st), ms = jax.lax.scan(body, (p, st), (gops, keys))
            return p, st, jax.tree_util.tree_map(lambda x: x[-1], ms)

        t0 = time.time()
        jstep1 = jax.jit(jstep)
        for s in range(0, n, CHUNK):
            k = min(CHUNK, n - s)
            gops = jnp.stack([jnp.asarray(gen(rng))[:, None] for _ in range(k)])
            key, *sks = jax.random.split(key, k + 1)
            if k != CHUNK:
                for i in range(k):
                    params, opt_state, m = jstep1(params, opt_state, gops[i], sks[i])
            else:
                params, opt_state, m = multi_step(
                    params, opt_state, gops, jnp.stack(sks))
            psnr = 10 * np.log10(1.0 / max(float(m["mse"]), 1e-12))
            print(f"  [{label}] step {s + k - 1:4d} loss {float(m['loss']):9.2f} "
                  f"psnr {psnr:6.2f} bpp {float(m['bpp']):6.3f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
        return params, key

    params, key = run_stage(params, make_optimizer(cfg), steps, key, "default")
    for stage in (0, 1, 2):
        params, key = run_stage(
            params, make_elfvc_stage_optimizer(cfg, stage), max(steps // 9, 1),
            key, f"spstage{stage}",
        )
    return params


def train_mcvc(spec, steps: int, seed: int = 0):
    """MCVC-IA resilience recipe (models.py:2146-2183): per-GOP sampled view
    failures, distortion supervised over ALL views (failed views included, so
    the cross-view backup attention decoders learn to reconstruct lost
    views), rate + aux over the full __call__ chain."""
    r = spec.r
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    gen = TestGoldenRDMCVC._synth_mv_gop
    gop0 = jnp.asarray(gen(rng))
    mask0 = jnp.ones((spec.extras["num_views"],), jnp.float32)
    params = jax.jit(
        lambda k, g, mk: spec.module.init(
            {"params": k}, g, mk, training=False)
    )(key, gop0, mask0)
    cfg = TrainConfig(learning_rate=1e-4)
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)

    def loss_fn(p, gop, mask, rng_):
        recons, liks, refs = spec.module.apply(
            p, gop, mask, training=True, rng=rng_)
        denom = gop.shape[1] * gop.shape[2] * gop.shape[3]
        bpp = sum(
            bits_estimate(lik["y"]) + bits_estimate(lik["z"])
            for d in liks for lik in d.values()
        ) / denom
        mse = jnp.mean((recons - gop) ** 2)  # ALL views, dead ones included
        # reference metrics_per_gop:199-205: the plain-decoder x_ref chain
        # (the P-frames' reference AND the OLFT touch-up label source)
        # trains alongside the enhanced recon — (enh + ref) / 2
        mse_ref = jnp.mean((refs - gop) ** 2)
        aux = spec.module.apply(p, method="aux_loss")
        loss = r * 0.5 * (mse + mse_ref) * gop.shape[0] + bpp + aux
        return loss, {"loss": loss, "mse": mse, "bpp": bpp}

    def jstep(p, st, gop, mask, rng_):
        (_, m), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            p, gop, mask, rng_)
        updates, st = tx.update(grads, st, p)
        return optax.apply_updates(p, updates), st, m

    CHUNK = 25  # amortize the per-call RPC latency of the tunneled chip

    @jax.jit
    def multi_step(p, st, gops, masks, keys):
        def body(carry, inp):
            p_, st_ = carry
            g, mk, k = inp
            p_, st_, m = jstep(p_, st_, g, mk, k)
            return (p_, st_), m
        (p, st), ms = jax.lax.scan(body, (p, st), (gops, masks, keys))
        return p, st, jax.tree_util.tree_map(lambda x: x[-1], ms)

    t0 = time.time()
    V = spec.extras["num_views"]
    jstep1 = jax.jit(jstep)
    for s in range(0, steps, CHUNK):
        n = min(CHUNK, steps - s)
        gops = jnp.stack([jnp.asarray(gen(rng)) for _ in range(n)])
        masks = jnp.stack([
            jnp.asarray(sample_view_mask(
                rng, 1, V, max_failed=1, failure_probability=0.2))
            for _ in range(n)
        ])
        key, *sks = jax.random.split(key, n + 1)
        if n != CHUNK:  # tail chunk would retrace; run it stepwise
            for i in range(n):
                params, opt_state, m = jstep1(
                    params, opt_state, gops[i], masks[i], sks[i])
        else:
            params, opt_state, m = multi_step(
                params, opt_state, gops, masks, jnp.stack(sks))
        psnr = 10 * np.log10(1.0 / max(float(m["mse"]), 1e-12))
        print(
            f"  step {s + n - 1:4d} loss {float(m['loss']):9.2f} "
            f"psnr {psnr:6.2f} bpp {float(m['bpp']):6.3f} "
            f"({time.time() - t0:.0f}s)", flush=True,
        )
    return params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("families", nargs="+", choices=sorted(FAMILIES))
    ap.add_argument("--steps", type=int, default=0,
                    help="override per-family step count (0 = recipe value)")
    ap.add_argument("--levels", type=int, nargs="*", default=None,
                    help="subset of the family's lambda levels to (re)train")
    ap.add_argument("--out", default=ASSETS)
    ap.add_argument("--r-bpp", type=float, default=1.0,
                    help="rate-term weight (scales the whole lambda ladder "
                    "down by this factor — the low-rate rung trains with 8)")
    ap.add_argument("--decay", action="store_true",
                    help="stepped LR decay (hd-rung recipe)")
    args = ap.parse_args()

    for fam in args.families:
        make_spec, levels, steps, gen = FAMILIES[fam]
        steps = args.steps or steps
        if args.levels is not None:
            levels = [l for l in levels if l in args.levels]
        for lvl in levels:
            spec = make_spec(lvl)
            print(f"[{fam} l{lvl}] {spec.name} lambda={spec.r:.0f} "
                  f"{steps} steps", flush=True)
            if fam == "mcvc":
                params = train_mcvc(spec, steps)
            elif spec.family == "elfvc":
                params = train_elfvc(spec, steps, gen=gen)
            elif spec.family == "ssf":
                params = train_ssf(spec, steps, gen=gen, r_bpp=args.r_bpp)
            else:
                params = train_single_view(spec, steps, gen=gen,
                                           decay=args.decay,
                                           r_bpp=args.r_bpp)
            if fam.endswith("_hd"):
                prefix, stem = "hd_", fam[:-3]
            elif fam.endswith("_192"):
                prefix, stem = "hd192_", fam[:-4]
            elif fam.endswith("_lr"):
                prefix, stem = "lr_", fam[:-3]
            else:
                prefix, stem = "tiny_", fam
            path = os.path.join(args.out, f"{prefix}{stem}_l{lvl}.npz")
            np.savez(path, **flatten_f16(params))
            print(f"  saved {path} "
                  f"({os.path.getsize(path) / 1e6:.1f} MB)", flush=True)


if __name__ == "__main__":
    main()
