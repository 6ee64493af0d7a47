"""RD training: loss composition per codec family + optax train step.

Loss shapes mirror the reference's parallel_compression aggregation
(models.py:233-410): per-P-frame `r * mse + bpp` summed over the GOP, plus
family extras (ELFVC-SP pred_err norm with weight alpha, models.py:290-299;
Base ER error norms; MCVC-OLFT drops the bpp term and trains on touch-up
labels). The reference's AMP GradScaler is unnecessary on TPU — bf16
activations with f32 params/grads need no loss scaling.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from fastvideocodec_tpu.gop.engine import rollout
from fastvideocodec_tpu.models.registry import CodecSpec


@dataclass
class TrainConfig:
    learning_rate: float = 1e-4
    aux_learning_rate: float = 1e-3
    weight_decay: float = 0.0
    grad_clip: float = 1.0
    alpha: float = 1.0       # ELFVC-SP pred_err weight
    r_img: float = 1.0
    r_bpp: float = 1.0
    r_aux: float = 1.0
    soft2hard: bool = False  # Base-ER s2h three-pass schedule (models.py:318-344)


def _msssim_distortion(spec, x_hat, gop):
    """1 - ms_ssim over the GOP (loss_type 'M', reference msssim_list
    lambdas models.py:73)."""
    from fastvideocodec_tpu.ops import ms_ssim

    target = gop if spec.family == "mcvc" else gop[1:]
    xh = x_hat.reshape((-1,) + x_hat.shape[-3:])
    tg = target.reshape((-1,) + target.shape[-3:])
    return 1.0 - ms_ssim(xh, tg)


def gop_loss(spec: CodecSpec, params, gop, training, rng, cfg: TrainConfig,
             mask=None):
    """Returns (scalar loss, metrics dict) for one GOP (or batch thereof).

    loss_type 'P' uses per-frame MSE (the rollout's img_loss); 'M' swaps the
    distortion for 1 - MS-SSIM with the msssim lambda table."""
    r = spec.r
    x_hat, m = rollout(spec, params, gop, training=training, rng=rng, mask=mask)
    if spec.loss_type == "M":
        d = _msssim_distortion(spec, x_hat, gop)
        m = dict(m)
        m["img_loss"] = jnp.broadcast_to(d, m["psnr"].shape) if hasattr(
            m["psnr"], "shape"
        ) and m["psnr"].ndim > 0 else d
        if "rec_loss" in m:
            m["rec_loss"] = d
    img = m["img_loss"] if "img_loss" in m else m["rec_loss"]
    if spec.family == "lsvc":
        loss = r * m["rec_loss"] + cfg.r_bpp * m["bpp"]
    elif spec.family == "mcvc":
        olft = spec.extras.get("olft", False)
        loss = jnp.sum(r * m["img_loss"])
        if not olft:
            loss = loss + jnp.sum(m["bpp_est"])
    elif spec.family == "base":
        loss = jnp.sum(r * m["img_loss"] + m["bpp_est"])
        if getattr(spec.module, "use_er", False):
            if training and cfg.soft2hard:
                # soft2hard three-pass (reference models.py:318-344): per
                # GOP, rerun with s2h_stage 1 (hard mv path) and 2 (hard
                # everything, stop-grad MC); distortion = mean of the three
                mses = [m["img_loss"]]
                for stg in (1, 2):
                    spec_s = dataclasses.replace(
                        spec, module=spec.module.clone(s2h_stage=stg)
                    )
                    _, ms = rollout(
                        spec_s, params, gop, training=True, rng=rng, mask=mask
                    )
                    mses.append(ms["img_loss"])
                mse_avg = (mses[0] + mses[1] + mses[2]) / 3.0
                loss = jnp.sum(r * mse_avg + m["bpp_est"])
            # ER trains the error generators through the pred_err norm
            # (reference err[1] added at models.py:336-338)
            loss = loss + jnp.sum(m["pred_err"])
    else:
        loss = jnp.sum(r * m["img_loss"] + m["bpp_est"])
        if spec.family == "elfvc" and spec.module.super_prec:
            loss = loss + cfg.alpha * jnp.sum(m["pred_err_norm"])
    # auxiliary quantile loss (only quantiles receive its gradient)
    aux = spec.module.apply(params, method="aux_loss")
    loss = loss + cfg.r_aux * aux
    metrics = {
        "loss": loss,
        "psnr": jnp.mean(m["psnr"]),
        "bpp": jnp.mean(m["bpp_est"] if "bpp_est" in m else m["bpp"]),
        "img_loss": jnp.mean(img),
        "aux": aux,
    }
    return loss, metrics


def _is_quantile_path(path) -> bool:
    return any("quantile" in str(getattr(k, "key", k)) for k in path)


# ELFVC staged-training parameter groups (reference optim_parameters,
# models.py:2055-2075): which submodule subtrees receive updates per spstage.
# Stage 0 warms up the SPnet predictors alone; stage 1 trains the motion SP
# path + residual autoencoder; stage 2 fine-tunes the residual SPnet +
# decoder. Any other stage trains everything.
ELFVC_STAGE_PARAM_GROUPS = {
    0: (
        ("res_hyperprior", "y_predictor"),
        ("motion_hyperprior", "y_predictor"),
    ),
    1: (
        ("motion_hyperprior", "y_predictor"),
        ("motion_decoder",),
        ("res_encoder",),
        ("res_decoder",),
        ("res_hyperprior",),
    ),
    2: (
        ("res_hyperprior", "y_predictor"),
        ("res_decoder",),
    ),
}


def elfvc_stage_trainable(sp_stage: int):
    """Returns path-filter(path)->bool for the stage's trainable set, or
    None when every parameter trains (reference 'Default stage')."""
    groups = ELFVC_STAGE_PARAM_GROUPS.get(sp_stage)
    if groups is None:
        return None

    def trainable(path) -> bool:
        keys = tuple(str(getattr(k, "key", k)) for k in path)
        if keys and keys[0] == "params":  # variables-dict collection prefix
            keys = keys[1:]
        return any(keys[: len(g)] == g for g in groups)

    return trainable


def make_optimizer(
    cfg: TrainConfig, learning_rate=None, trainable=None
) -> optax.GradientTransformation:
    """Main Adam (scheduled lr) for model params + a dedicated Adam at
    cfg.aux_learning_rate for entropy-bottleneck `quantiles` params — the
    reference/compressai two-optimizer split (compressai configure_optimizers;
    the aux loss's gradient only reaches quantiles, so routing by param path
    is exactly the '.quantiles' parameter group).

    `trainable(path)->bool` freezes every parameter outside the filter
    (zeroed updates) — the staged ELFVC recipes route through this."""
    lr = cfg.learning_rate if learning_rate is None else learning_rate
    main = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(lr, weight_decay=cfg.weight_decay)
        if cfg.weight_decay
        else optax.adam(lr),
    )
    aux = optax.adam(cfg.aux_learning_rate)

    def label_fn(params):
        def label(path, _):
            if trainable is not None and not trainable(path):
                return "frozen"
            return "aux" if _is_quantile_path(path) else "main"

        return jax.tree_util.tree_map_with_path(label, params)

    return optax.multi_transform(
        {"main": main, "aux": aux, "frozen": optax.set_to_zero()}, label_fn
    )


def make_elfvc_stage_optimizer(
    cfg: TrainConfig, sp_stage: int, learning_rate=None
) -> optax.GradientTransformation:
    """The spstage-keyed optimizer of the Vesper training recipe
    (reference models.py:2026-2078)."""
    return make_optimizer(
        cfg, learning_rate=learning_rate, trainable=elfvc_stage_trainable(sp_stage)
    )


def make_train_step(
    spec: CodecSpec, cfg: TrainConfig, optimizer=None, batched: bool = False
) -> tuple:
    """Returns (init_fn(params) -> opt_state, step_fn).

    step_fn(params, opt_state, gop, rng [, mask]) -> (params, opt_state,
    metrics); jit it (or pjit over a mesh) at the call site. With
    ``batched=True`` the gop (and mask) carry a leading batch axis; the loss
    is vmapped over it and averaged (reference train.py batch_size > 1).
    """
    tx = make_optimizer(cfg) if optimizer is None else optimizer

    def init_fn(params):
        return tx.init(params)

    def loss_fn(params, gop, rng, mask):
        # Training always uses the EXACT warp for forward AND backward: the
        # Pallas kernel's v5 vertical-window clamp can disagree with the
        # exact gather at motion boundaries with >±12 rows of divergent
        # vertical motion, and pairing a clamped forward with the exact
        # gradient (ops/pallas/warp_kernel.py custom_vjp) would silently
        # bias training. Training shapes (64²-256² crops) are where the XLA
        # gather is cheap anyway — the kernel is a 1080p+ inference/bench
        # win (module docstring). exact_warp flips a trace-time switch, so
        # it binds here, inside the traced step. Parity + the measured
        # clamp effect: tests/test_pallas_warp.py (training-parity tests).
        from fastvideocodec_tpu.ops.warp import exact_warp

        with exact_warp():
            if not batched:
                return gop_loss(spec, params, gop, True, rng, cfg, mask)
            rngs = jax.random.split(rng, gop.shape[0])
            if mask is None:
                losses, metrics = jax.vmap(
                    lambda g, r: gop_loss(spec, params, g, True, r, cfg, None)
                )(gop, rngs)
            else:
                losses, metrics = jax.vmap(
                    lambda g, r, mk: gop_loss(spec, params, g, True, r, cfg, mk)
                )(gop, rngs, mask)
            return jnp.mean(losses), jax.tree_util.tree_map(jnp.mean, metrics)

    def step_fn(params, opt_state, gop, rng, mask=None):
        (loss, metrics), grads = jax.value_and_grad(
            lambda p: loss_fn(p, gop, rng, mask), has_aux=True
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        return params, opt_state, metrics

    return init_fn, step_fn


def make_eval_step(spec: CodecSpec, cfg: TrainConfig | None = None):
    cfg = cfg or TrainConfig()

    def eval_fn(params, gop, mask=None):
        _, metrics = gop_loss(spec, params, gop, False, None, cfg, mask)
        return metrics

    return eval_fn
