"""Seeded synthetic motion-clip generators.

This environment has no egress, so no real video corpus (Vimeo/UVG/MMPT,
reference dataset.py) can be mounted; every RD regression and checkpoint in
this repo trains on these seeded generators instead (assets/TINY_RD.md).
The generators live in the package (not tests/) so the trainers
(tools/train_tiny.py), the golden tests (tests/test_rd.py), and benches
share a single source of truth: the regression clips are drawn from the
SAME distribution as the shipped checkpoints' training data, with disjoint
seeds (training uses seed 0; held-out clips use seed 123).

- synth_gop: smooth translating texture (the original tiny-RD corpus;
  single global motion <= 3 px/frame).
- synth_mv_gop: V offset crops of one translating texture (cross-view
  redundancy for the MCVC-IA backup attention decoders).
- synth_gop_multi: multi-object rung — a translating background plus
  foreground patches with DIFFERENT motions (real motion boundaries, up to
  ~16 px/frame of vertical divergence), at 128/256 px scale.  This is the
  corpus for the scaled head-to-head (LSVC-128 vs LSVC-TPU at reference
  channel widths) and for bounding the Pallas warp kernel's v5
  vertical-window clamp under training (ops/pallas/warp_kernel.py
  docstring: spread beyond ~±11 rows clamps).
"""

from __future__ import annotations

import numpy as np


def _smooth(base: np.ndarray, rounds: int = 3) -> np.ndarray:
    for _ in range(rounds):
        base = (
            base
            + np.roll(base, 1, 0) + np.roll(base, -1, 0)
            + np.roll(base, 1, 1) + np.roll(base, -1, 1)
        ) / 5.0
    return (base - base.min()) / (base.max() - base.min() + 1e-6)


def synth_gop(rng: np.random.Generator, size: int = 64, gop: int = 4):
    """Smooth translating texture + light noise — the training distribution
    of the shipped tiny checkpoints (identical draw order to the original
    tests/test_rd.py generator at the 64/4 defaults)."""
    H = W = size
    T = gop
    base = rng.random((H * 2, W * 2, 3)).astype(np.float32)
    base = _smooth(base)
    dx, dy = rng.integers(-3, 4, size=2)
    frames = []
    ox, oy = H // 2, W // 2
    for t in range(T):
        f = base[ox + t * dy : ox + t * dy + H, oy + t * dx : oy + t * dx + W]
        f = np.clip(f + rng.normal(0, 0.01, f.shape).astype(np.float32), 0, 1)
        frames.append(f)
    return np.stack(frames)  # [T, H, W, 3]


def synth_mv_gop(rng: np.random.Generator, views: int = 3, size: int = 64,
                 gop: int = 4):
    """V offset crops of one translating texture (multi-view redundancy);
    identical draw order to the original TestGoldenRDMCVC._synth_mv_gop at
    the 3/64/4 defaults. Returns [T, V, H, W, 3]."""
    V = views
    H = W = size
    T = gop
    base = rng.random((H * 3, W * 3, 3)).astype(np.float32)
    base = _smooth(base)
    dx, dy = rng.integers(-3, 4, size=2)
    offs = [(0, 0), (0, W // 2), (H // 2, 0), (H // 2, W // 2),
            (0, W), (H, 0)][:V]
    frames = []
    for t in range(T):
        view_list = []
        for vy, vx in offs:
            sy, sx = H + vy + t * dy, W + vx + t * dx
            f = base[sy : sy + H, sx : sx + W]
            view_list.append(np.clip(
                f + rng.normal(0, 0.01, f.shape).astype(np.float32), 0, 1
            ))
        frames.append(np.stack(view_list))
    return np.stack(frames)  # [T, V, H, W, 3]


def synth_gop_multi(rng: np.random.Generator, size: int = 128, gop: int = 8,
                    n_objects: int = 2, max_bg_motion: int = 4,
                    max_obj_motion: int = 8, noise: float = 0.005,
                    smooth_rounds: int = 3):
    """Multi-object motion clips with real motion boundaries.

    A smooth background translates by a per-clip constant (|v| <=
    max_bg_motion px/frame); n_objects soft-edged elliptical patches of a
    DIFFERENT smooth texture ride on top, each with its own constant motion
    (|v| <= max_obj_motion px/frame). Opposite-sign vertical motions across
    an object edge give tiles up to (max_obj_motion + max_bg_motion) * T px
    of vertical source-coordinate divergence — past the Pallas v5 window
    budget, which is exactly what the kernel-vs-exact training-parity test
    needs to exercise.

    Returns [T, size, size, 3] float32 in [0, 1].
    """
    H = W = size
    T = gop
    pad = max(max_bg_motion, max_obj_motion) * T + 8
    bg = _smooth(rng.random((H + 2 * pad, W + 2 * pad, 3)).astype(np.float32),
                 rounds=smooth_rounds)
    bg_v = rng.integers(-max_bg_motion, max_bg_motion + 1, size=2)  # (dy, dx)

    objs = []
    for _ in range(n_objects):
        r_h = int(rng.integers(H // 8, H // 3))
        r_w = int(rng.integers(W // 8, W // 3))
        tex = _smooth(rng.random((2 * r_h, 2 * r_w, 3)).astype(np.float32),
                      rounds=smooth_rounds)
        # soft elliptical alpha so edges don't ring
        yy = (np.arange(2 * r_h) - r_h + 0.5) / r_h
        xx = (np.arange(2 * r_w) - r_w + 0.5) / r_w
        d = np.sqrt(yy[:, None] ** 2 + xx[None, :] ** 2)
        alpha = np.clip((1.0 - d) * 4.0, 0.0, 1.0).astype(np.float32)[..., None]
        cy = int(rng.integers(r_h, H - r_h))
        cx = int(rng.integers(r_w, W - r_w))
        v = rng.integers(-max_obj_motion, max_obj_motion + 1, size=2)
        objs.append((tex, alpha, cy, cx, v))

    frames = []
    for t in range(T):
        oy = pad + t * int(bg_v[0])
        ox = pad + t * int(bg_v[1])
        f = bg[oy : oy + H, ox : ox + W].copy()
        for tex, alpha, cy, cx, v in objs:
            py = cy + t * int(v[0]) - tex.shape[0] // 2
            px = cx + t * int(v[1]) - tex.shape[1] // 2
            y0, y1 = max(py, 0), min(py + tex.shape[0], H)
            x0, x1 = max(px, 0), min(px + tex.shape[1], W)
            if y1 <= y0 or x1 <= x0:
                continue
            ty0, tx0 = y0 - py, x0 - px
            a = alpha[ty0 : ty0 + y1 - y0, tx0 : tx0 + x1 - x0]
            f[y0:y1, x0:x1] = (
                a * tex[ty0 : ty0 + y1 - y0, tx0 : tx0 + x1 - x0]
                + (1 - a) * f[y0:y1, x0:x1]
            )
        if noise:
            f = f + rng.normal(0, noise, f.shape).astype(np.float32)
        frames.append(np.clip(f, 0, 1))
    return np.stack(frames)


def synth_gop_lowrate(rng: np.random.Generator, size: int = 128, gop: int = 8):
    """Low-entropy variant of the multi-object rung: the SAME scene
    structure (translating background + independently-moving soft-edged
    objects — real motion boundaries) but noise-free and heavily smoothed
    (8 blur rounds), so trained codecs operate in the reference's
    low-bpp regime (bpp 0.04-1.05 at 32-44 dB, plot_hermes.py:482-499 /
    plot_vesper.py:679-680) instead of the noisy tiny rung's 1.1-2.2 bpp.
    Zero-dominated latents at these rates stress the entropy stack's CDF
    tails and the range coder's escape path — the low-rate golden tests'
    purpose (tests/test_rd.py TestLowRateRung)."""
    return synth_gop_multi(rng, size=size, gop=gop, noise=0.0,
                           smooth_rounds=8)
