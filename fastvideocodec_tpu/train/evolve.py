"""Per-video encoder overfitting ("evolve" mode).

Reference train.py:315-401 / eval.py:357-473: before coding a video, the
ENCODER-side parameters are fine-tuned on that video's frames (the decoder
stays fixed, so the receiver needs no update), then the video is coded with
the evolved encoder. Gradient masking is done with optax.multi_transform so
decoder/entropy-table params provably never move.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax

from fastvideocodec_tpu.gop.engine import rollout
from fastvideocodec_tpu.models.registry import CodecSpec
from fastvideocodec_tpu.train.trainer import TrainConfig, gop_loss

# parameter subtrees considered encoder-side per family (sender-only)
ENCODER_KEYS = (
    "optic_flow", "mv_encoder", "res_encoder", "prior_encoder",
    "img_encoder", "motion_encoder", "flow_predictor", "enc",
)


def _is_encoder_path(path) -> bool:
    names = [getattr(p, "key", str(p)) for p in path]
    return any(any(k in str(n) for k in ENCODER_KEYS) for n in names)


def encoder_mask(params):
    """True where a leaf belongs to an encoder-side subtree."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    leaves = [(_is_encoder_path(path)) for path, _ in flat]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def evolve_on_video(
    spec: CodecSpec,
    params,
    gops,
    steps: int = 50,
    learning_rate: float = 1e-5,
    rng=None,
    cfg: TrainConfig | None = None,
):
    """Fine-tunes encoder-side params on this video's GOP list.

    gops: iterable of [T, H, W, 3] arrays (host or device). Returns
    (evolved params, best RD score seen)."""
    cfg = cfg or TrainConfig(learning_rate=learning_rate)
    mask = encoder_mask(params)
    tx = optax.multi_transform(
        {
            "train": optax.adam(learning_rate),
            "freeze": optax.set_to_zero(),
        },
        jax.tree.map(lambda m: "train" if m else "freeze", mask),
    )
    opt_state = tx.init(params)
    rng = rng if rng is not None else jax.random.PRNGKey(0)

    @jax.jit
    def step(params, opt_state, gop, key):
        (loss, metrics), grads = jax.value_and_grad(
            lambda p: gop_loss(spec, p, gop, True, key, cfg), has_aux=True
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, metrics

    gops = list(gops)
    best = float("inf")
    for i in range(steps):
        rng, sk = jax.random.split(rng)
        gop = jnp.asarray(gops[i % len(gops)])
        params, opt_state, metrics = step(params, opt_state, gop, sk)
        score = float(metrics["bpp"]) + float(metrics["img_loss"]) * spec.r
        best = min(best, score)
    return params, best
