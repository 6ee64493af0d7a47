"""GOP engine: jit-friendly per-family GOP rollouts.

The reference's `parallel_compression` (models.py:233-410) is a python loop
dispatching per model name; here every sequential family becomes a
`lax.scan` over the frame axis (state carried functionally, reconstruction
stop-gradiented between frames exactly like the reference's
`x_prev.detach()` at models.py:282/326/360) and LSVC/MCVC stay whole-GOP
calls. Each rollout returns per-frame metric stacks; loss composition lives
in the trainer.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import jax
import jax.numpy as jnp

if TYPE_CHECKING:  # avoid a models<->gop import cycle at runtime
    from fastvideocodec_tpu.models.registry import CodecSpec


def _psnr_from_mse(mse):
    return 10.0 * jnp.log(1.0 / mse) / jnp.log(10.0)


def sequential_gop(spec: CodecSpec, params, gop, training: bool, rng=None):
    """DVC / Base: stateless per-frame codec, carry = previous recon.

    gop: [T, B?, H, W, 3] with frame 0 already I-coded. Uses [T, H, W, 3]
    batched as [T, 1, H, W, 3] internally.
    """
    module = spec.module
    frames = gop[:, None] if gop.ndim == 4 else gop
    T = frames.shape[0]
    rngs = jax.random.split(rng, T - 1) if rng is not None else jnp.zeros((T - 1, 2), jnp.uint32)

    def step(x_prev, inp):
        x_cur, step_rng = inp
        r = step_rng if rng is not None else None
        x_rec, metrics = module.apply(params, x_cur, x_prev, training=training, rng=r)
        metrics["psnr"] = _psnr_from_mse(metrics["img_loss"])
        return jax.lax.stop_gradient(x_rec), (x_rec, metrics)

    _, (x_hat, metrics) = jax.lax.scan(step, frames[0], (frames[1:], rngs))
    return x_hat, metrics


def rlvc_gop(spec: CodecSpec, params, gop, training: bool, rng=None):
    """RLVC / RLVC2: recurrent hidden + prior-latent carry; the entropy
    model switches from factorized to RPM after the first P-frame
    (reference models.py:347-367)."""
    module = spec.module
    frames = gop[:, None] if gop.ndim == 4 else gop
    T, B, H, W, _ = frames.shape
    hidden = module.init_hidden(B, H, W)
    rngs = jax.random.split(rng, T - 1) if rng is not None else jnp.zeros((T - 1, 2), jnp.uint32)
    flags = jnp.arange(1, T) > 1  # RPM_flag = (frame index > 1)

    def step(carry, inp):
        x_prev, hidden = carry
        x_cur, flag, step_rng = inp
        r = step_rng if rng is not None else None
        x_rec, hidden, metrics = module.apply(
            params, x_prev, x_cur, hidden, flag, training=training, rng=r
        )
        metrics["psnr"] = _psnr_from_mse(metrics["img_loss"])
        return (jax.lax.stop_gradient(x_rec), hidden), (x_rec, metrics)

    (_, _), (x_hat, metrics) = jax.lax.scan(
        step, (frames[0], hidden), (frames[1:], flags, rngs)
    )
    return x_hat, metrics


def _pipe_fold(module, frames):
    """pipeline_s2d boundary: fold [T, B, H, W, 3] into the s2d domain
    once per GOP (the per-frame pipeline never touches full res)."""
    from fastvideocodec_tpu.ops import space_to_depth

    return jax.vmap(lambda f: space_to_depth(f, module.s2d))(frames)


def _pipe_unfold(module, x_hat):
    from fastvideocodec_tpu.ops import depth_to_space

    return jax.vmap(lambda f: depth_to_space(f, module.s2d))(x_hat)


def ssf_gop(spec: CodecSpec, params, gop, training: bool, rng=None):
    """SSF-Official / MCVC-Original: plain forward_inter chain
    (models.py:260-309). pipeline_s2d configs run the whole chain in the
    s2d domain (MSE/bpp are permutation-invariant; the recon stack
    unfolds once at the end)."""
    module = spec.module
    frames = gop[:, None] if gop.ndim == 4 else gop
    pipe = getattr(module, "pipeline_s2d", False)
    if pipe:
        frames = _pipe_fold(module, frames)
    T = frames.shape[0]
    rngs = jax.random.split(rng, T - 1) if rng is not None else jnp.zeros((T - 1, 2), jnp.uint32)

    def step(x_prev, inp):
        x_cur, step_rng = inp
        r = step_rng if rng is not None else None
        x_rec, lik = module.apply(
            params, x_cur, x_prev, training=training, rng=r,
            method=module.forward_inter,
        )
        metrics = _ssf_metrics(x_cur, x_rec, lik)
        return jax.lax.stop_gradient(x_rec), (x_rec, metrics)

    _, (x_hat, metrics) = jax.lax.scan(step, frames[0], (frames[1:], rngs))
    if pipe:
        x_hat = _pipe_unfold(module, x_hat)
    return x_hat, metrics


def _bits(lik):
    from fastvideocodec_tpu.ops import bits_estimate

    return bits_estimate(lik)


def _ssf_metrics(x_cur, x_rec, lik):
    B, H, W, C = x_cur.shape
    # bpp is per FULL-RES pixel: in the s2d pipeline the carried tensor
    # is [B, H/2, W/2, 12], so the pixel count is B*H*W*(C/3)
    denom = B * H * W * (C // 3)
    mot = _bits(lik["motion"]["y"]) + _bits(lik["motion"]["z"])
    res = _bits(lik["residual"]["y"]) + _bits(lik["residual"]["z"])
    mse = jnp.mean((x_rec - x_cur) ** 2)
    return {
        "img_loss": mse,
        "psnr": _psnr_from_mse(mse),
        "bpp_est": (mot + res) / denom,
        "bpp_res_est": res / denom,
    }


def elfvc_gop(spec: CodecSpec, params, gop, training: bool, rng=None):
    """ELFVC(-SP): temporal state carry (flow prior, x_ref_ref, Q_y priors)
    reset per GOP (models.py:264-265, 2020-2024)."""
    module = spec.module
    frames = gop[:, None] if gop.ndim == 4 else gop
    pipe = getattr(module, "pipeline_s2d", False)
    if pipe:
        frames = _pipe_fold(module, frames)
    T, B, H, W, _ = frames.shape
    state = module.init_state(B, H, W)  # carried dims (s2d dims when pipe)
    rngs = jax.random.split(rng, T - 1) if rng is not None else jnp.zeros((T - 1, 2), jnp.uint32)

    def step(carry, inp):
        x_prev, state = carry
        x_cur, step_rng = inp
        r = step_rng if rng is not None else None
        x_rec, out, state = module.apply(
            params, x_cur, x_prev, state, training=training, rng=r,
            method=module.forward_inter,
        )
        metrics = _ssf_metrics(x_cur, x_rec, out)
        if spec.module.super_prec:
            metrics["pred_err_norm"] = sum(
                jnp.sqrt(jnp.sum(pe ** 2)) for pe in out["pred_err"]
            )
            metrics["Q_err_norm"] = sum(
                jnp.sqrt(jnp.sum(qe ** 2)) for qe in out["Q_err"]
            )
        return (jax.lax.stop_gradient(x_rec), state), (x_rec, metrics)

    (_, _), (x_hat, metrics) = jax.lax.scan(step, (frames[0], state), (frames[1:], rngs))
    if pipe:
        x_hat = _pipe_unfold(module, x_hat)
    return x_hat, metrics


def lsvc_gop(spec: CodecSpec, params, gop, training: bool, rng=None):
    """LSVC: one whole-GOP call (models.py:384-397)."""
    com, mc, warped, metrics = spec.module.apply(params, gop, training=training, rng=rng)
    target = gop[1:]
    per_frame_mse = jnp.mean((com - target) ** 2, axis=(1, 2, 3))
    metrics["psnr"] = _psnr_from_mse(per_frame_mse)
    metrics["mc_psnr"] = _psnr_from_mse(jnp.mean((mc - target) ** 2, axis=(1, 2, 3)))
    metrics["warp_psnr"] = _psnr_from_mse(
        jnp.mean((warped - target) ** 2, axis=(1, 2, 3))
    )
    return com, metrics


def mcvc_gop(spec: CodecSpec, params, gop, mask, training: bool, rng=None):
    """MCVC: whole-GOP call; gop [T, B*V, H, W, 3], mask [B*V].

    Metrics follow the reference metrics_per_gop (train_multiview.py:161-210):
    distortion is averaged over the ALIVE views only (`non_zero_indices`),
    and `completeness` reports the surviving-view fraction."""
    recons, liks, refs = spec.module.apply(params, gop, mask, training=training, rng=rng)
    T = gop.shape[0]
    denom = gop.shape[1] * gop.shape[2] * gop.shape[3]
    bpps = []
    for i, lik in enumerate(liks):
        if "keyframe" in lik:
            b = _bits(lik["keyframe"]["y"]) + _bits(lik["keyframe"]["z"])
        else:
            b = (
                _bits(lik["motion"]["y"]) + _bits(lik["motion"]["z"])
                + _bits(lik["residual"]["y"]) + _bits(lik["residual"]["z"])
            )
        bpps.append(b / denom)
    if mask is None:
        mask = jnp.ones((gop.shape[1],), gop.dtype)
    alive = mask.astype(recons.dtype)

    def alive_mse(x_hat):
        per_view = jnp.mean((x_hat - gop) ** 2, axis=(2, 3, 4))  # [T, B*V]
        return jnp.sum(per_view * alive[None, :], axis=1) / jnp.maximum(
            jnp.sum(alive), 1.0
        )

    mse = alive_mse(recons)
    img_loss = mse
    if training:
        # reference metrics_per_gop:199-205 "supervise the ref frame":
        # the plain-decoder x_ref chain (the P-frames' actual reference)
        # trains alongside the enhanced recon — mseloss = (enh + ref) / 2.
        # PSNR stays the enhanced-recon quality (computed before the ref
        # term in the reference).
        img_loss = 0.5 * (mse + alive_mse(refs))
    metrics = {
        "img_loss": img_loss,
        "psnr": _psnr_from_mse(mse),
        "bpp_est": jnp.stack(bpps),
        "completeness": jnp.sum(alive) / alive.shape[0],
    }
    return recons, metrics


GOP_ROLLOUTS = {
    "dvc": sequential_gop,
    "base": sequential_gop,
    "rlvc": rlvc_gop,
    "ssf": ssf_gop,
    "elfvc": elfvc_gop,
    "lsvc": lsvc_gop,
    "mcvc": mcvc_gop,
}


def rollout(spec: CodecSpec, params, gop, training: bool, rng=None, mask=None):
    fn = GOP_ROLLOUTS[spec.family]
    if spec.family == "mcvc":
        return fn(spec, params, gop, mask, training, rng)
    return fn(spec, params, gop, training, rng)
