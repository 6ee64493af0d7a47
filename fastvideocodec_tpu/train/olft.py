"""OLFT online fine-tuning support: touch-up pixel sampling.

Reference replace_elements (models.py:2192-2235): pick the top-r% pixels by
|recon - raw|, replace them in the recon to build an online training label,
and account their bandwidth cost by zlib-compressing (delta bytes + mask
bitmap). The top-k selection runs on device (one jit'd op); the zlib cost
accounting is host-side."""

from __future__ import annotations

import zlib

import jax
import jax.numpy as jnp
import numpy as np


def touchup_labels(recon: jax.Array, raw: jax.Array, ratio: float):
    """Device-side: returns (label, mask) where label = recon with the
    top-`ratio` pixels (by abs error) replaced by raw values."""
    if ratio <= 0:
        return recon, jnp.zeros_like(recon, dtype=bool)
    diff = jnp.abs(recon - raw).ravel()
    k = int(ratio * diff.size)
    thresh = jax.lax.top_k(diff, k)[0][-1]
    mask = (jnp.abs(recon - raw) >= thresh)
    label = jnp.where(mask, raw, recon)
    return label, mask


def make_olft_step(spec, cfg, ratio: float, optimizer=None):
    """Reference-faithful OLFT training step (models.py:2297-2352 +
    train_multiview.py:171-205):

    - the model consumes RAW frames (not pre-touched labels);
    - per frame, the touch-up label is built INSIDE the step from the
      detached x_ref chain: ``x_touch = replace_elements(x_ref, raw, r)``
      (models.py:2318-2321, 2338-2341) — the camera ships the top-r%%
      worst pixels as online labels;
    - distortion supervises the (enhanced) reconstruction against
      x_touch over the alive views; touched pixels carry the raw-frame
      signal, while the UNTOUCHED pixels equal the detached plain x_ref
      chain — so the loss also pulls the enhanced recon toward the
      plain-decoder output there (matching the reference's x_hat vs
      x_touch built from x_ref, metrics_per_gop);
    - loss = r * mse with NO estimated-bpp term (reference
      train_multiview.py:242-244: ``loss = model.r*mse`` for OLFT; the
      touch-up bandwidth is accounted on the host via zlib instead).

    Returns (init_fn, step_fn) where step_fn(params, opt_state, gop, rng,
    mask) -> (params, opt_state, metrics). metrics carries the device
    tensors the host-side zlib accounting needs under 'touch_refs' /
    'touch_labels' / 'touch_mask' (pop them before logging scalars).
    """
    from functools import partial

    import optax

    from fastvideocodec_tpu.train.trainer import make_optimizer

    tx = make_optimizer(cfg) if optimizer is None else optimizer
    r = spec.r

    def init_fn(params):
        return tx.init(params)

    def loss_fn(params, gop, rng, mask):
        recons, liks, refs = spec.module.apply(
            params, gop, mask, training=True, rng=rng
        )
        # per-frame touch-up labels from the DETACHED x_ref chain
        label, tmask = jax.vmap(partial(touchup_labels, ratio=ratio))(
            jax.lax.stop_gradient(refs), gop
        )
        alive = (
            mask if mask is not None else jnp.ones((gop.shape[1],))
        ).astype(recons.dtype)
        per_view = jnp.mean((recons - label) ** 2, axis=(2, 3, 4))  # [T, B*V]
        mse = jnp.sum(per_view * alive[None, :], axis=1) / jnp.maximum(
            jnp.sum(alive), 1.0
        )
        loss = jnp.sum(r * mse)
        # true-quality metrics stay vs RAW frames
        raw_mse = jnp.sum(
            jnp.mean((recons - gop) ** 2, axis=(2, 3, 4)) * alive[None, :],
            axis=1,
        ) / jnp.maximum(jnp.sum(alive), 1.0)
        denom = gop.shape[1] * gop.shape[2] * gop.shape[3]
        from fastvideocodec_tpu.ops import bits_estimate

        bits = sum(
            bits_estimate(lik_d["y"]) + bits_estimate(lik_d["z"])
            for d in liks
            for lik_d in d.values()
        )
        metrics = {
            "loss": loss,
            "psnr": jnp.mean(
                -10.0 * jnp.log10(jnp.maximum(raw_mse, 1e-12))
            ),
            "bpp": bits / (gop.shape[0] * denom),
            "img_loss": jnp.mean(mse),
            "touch_refs": refs,
            "touch_labels": label,
            "touch_mask": tmask,
        }
        return loss, metrics

    def step_fn(params, opt_state, gop, rng, mask=None):
        (loss, metrics), grads = jax.value_and_grad(
            lambda p: loss_fn(p, gop, rng, mask), has_aux=True
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        return params, opt_state, metrics

    return init_fn, step_fn


def touchup_bits(recon: np.ndarray, label: np.ndarray, mask: np.ndarray,
                 use_compression: bool = True) -> int:
    """Host-side bandwidth cost in bytes (models.py:2218-2233): zlib of the
    changed-value deltas (uint8) plus the boolean location bitmap."""
    if not mask.any():
        return 0
    if use_compression:
        deltas = ((label - recon) * 255.0).astype(np.uint8)[mask]
        payload = deltas.tobytes() + np.packbits(mask.astype(np.uint8)).tobytes()
        return len(zlib.compress(payload))
    return len((label * 255.0).astype(np.uint8).tobytes())


def probe_sample_interval(
    spec,
    params,
    dataset,
    sample_ratio: float,
    bw_limit_bps: float,
    fps: float = 30.0,
    num_gops: int = 2,
    rng=None,
) -> int:
    """Bandwidth probe (reference probe_sample_interval,
    train_multiview.py:392-406): run a few GOPs of the OLFT touch-up path,
    measure the touch-up data rate at sampling-every-frame, and return the
    frame sampling interval that fits under `bw_limit_bps`."""
    from functools import partial

    from fastvideocodec_tpu.gop import rollout

    rng = np.random.default_rng(0) if rng is None else rng
    jroll = jax.jit(partial(rollout, spec, training=False, rng=None))
    jlabel = jax.jit(partial(touchup_labels, ratio=sample_ratio))
    total_bits = 0
    total_frames = 0
    for g in range(num_gops):
        idx = int(rng.integers(0, len(dataset)))
        gop = jnp.asarray(dataset[idx])
        mask = jnp.ones((gop.shape[1],))
        recons, _ = jroll(params, gop, mask=mask)
        labels, masks = jlabel(recons, gop)
        total_bits += 8 * touchup_bits(
            np.asarray(recons), np.asarray(labels), np.asarray(masks)
        )
        total_frames += gop.shape[0]
    rate_bps = total_bits / max(total_frames, 1) * fps
    return max(1, int(np.ceil(rate_bps / max(bw_limit_bps, 1.0))))
