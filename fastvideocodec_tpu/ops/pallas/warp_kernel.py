"""Pallas TPU kernel for bilinear backward warping.

Why: XLA lowers per-pixel warp gathers to element-at-a-time loads on TPU —
a single [4, 1024, 2048, 3] flow-warp measures ~1.4 s on a v5e chip, making
warping (the codec's hottest op: SPyNet levels + motion compensation,
SURVEY.md §2.9 'CUDA kernels -> Pallas') 99% of LSVC runtime.

Idea: express the warp as dense MXU math instead of random access. For an
(8, TILE_W) output tile, every source pixel lies in a bounded halo around
the tile (|flow| clamped to max_displacement R). Bilinear sampling is

    out[p, c] = sum_h sum_x Wr[h, p] * Wc[x, p] * halo[c, h, x]

with Wr a per-pixel 2-tap vertical lerp and Wc the horizontal one, both
built as relu(1 - |iota - coord|) (exactly the 2-tap lerp weights). The
kernel contracts the WIDE axis on the MXU — F_c = halo[c] @ Wc is one
[Hh, Wh] x [Wh, P] matmul per channel — and the NARROW vertical axis on
the VPU: out[p, c] = sum_h Wr[h, p] * F_c[h, p]. v3 did it the other way
(vertical on MXU, horizontal on VPU) and was VPU-bound on the horizontal
multiply-reduce: per channel it touched P*Wh elements where this order
touches P*Hh, and Hh is 3-10x smaller than Wh (Wh rounds up to lane
multiples of 128; Hh to sublane multiples of 8). Chip numbers in
tools/warp_bench.py.

The halo travels as ONE 3-D DMA per grid step from a channel-planar padded
source [B, C, Hp, Wp] into a [C, Hh, Wh] VMEM scratch (channel-count-
independent issue cost — the space-to-depth LSVC-TPU variant warps 12/48-
channel images). Mosaic cannot reshape across sublane/lane boundaries, so
the flow input and the warp output travel in a pre-tiled layout
([B, nI, nJ, P(, ...)] with P = 8*TILE_W flattened tile pixels); the
XLA-side reshapes/transposes around the pallas_call are cheap relayouts.

Semantics match ops.warp.flow_warp (linspace grid + flow/(size-1)*2, border
padding, align_corners=False) exactly for |flow| <= R; larger displacements
clamp to R (per call site — motion-compensation warps of a trained codec
need far less halo than full-res SPyNet). Backward falls back to the XLA
implementation via custom_vjp, so gradients are exact — and because a
CLAMPED forward paired with an exact gradient could bias training at
motion boundaries where the clamp binds, make_train_step forces the exact
warp for the whole training step (train/trainer.py): this kernel serves
inference and benchmarking, where shapes are 1080p+ and no gradient
exists. The clamp's effect under optimization is measured (not assumed) in
tests/test_pallas_warp.py::TestTrainingWarpSemantics.

v5 offset mode (active when R >= ~20): the horizontal halo width is
lane-locked at round_up(TILE_W + 2R + 1, 128) = 256 for every R <= 63, so
only the VERTICAL halo extent drives the per-channel matmul — and after v4
the kernel is MXU-MAC-bound (~70% of bf16 peak), so MACs are the bill. A
per-tile vertical offset (the tile's midrange source row, quantized to the
8-row sublane alignment, shipped via scalar prefetch) selects a short
Hv-row residual window out of the full halo; the matmul contracts Hv rows
instead of Hh (R=56: 128 -> 40). Additional exactness condition: a tile's
vertical source-coordinate spread around its midrange must fit the
residual budget (~±11 rows); pixels beyond it clamp to the window edge.
Decoded/estimated flow fields are smooth at 8x128-tile granularity, so
this matches everywhere except motion-boundary tiles with >11 px of
divergent vertical motion; the real-bitstream coder paths force the exact
XLA warp anyway (ops/warp.py exact_warp).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 8
TILE_W = 128
P = TILE_H * TILE_W

MAX_KERNEL_CHANNELS = 64  # per-channel dot unroll bound (VMEM + code size)
MAX_DISPLACEMENT_BOUND = 123  # Wh=384: TILE_W + 2R + 1 <= 384


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _warp_kernel(*refs,
                 R, H, W, C, Hh, Wh, out_dtype, pixel_mode=False,
                 nB=1, nI=1, nJ=1, nbuf=2, strip=False, th=TILE_H,
                 Hv=0):
    # v5 offset mode (Hv > 0): a scalar-prefetched per-tile vertical offset
    # (in 8-row units — Mosaic requires provably 8-aligned sublane slices)
    # selects an Hv-row residual window out of the full Hh-row halo, so the
    # per-channel matmul contracts Hv rows instead of Hh. The horizontal
    # halo is lane-locked at Wh = round_up(TILE_W + 2R + 1, 128) for every
    # R <= 63 anyway, so only the vertical extent drives MACs — and the
    # kernel is MXU-MAC-bound after v4 (chip: 70% of bf16 peak).
    if Hv:
        offs_ref, flow_ref, xpad_ref, out_ref, halo_scratch, dma_sem = refs
    else:
        flow_ref, xpad_ref, out_ref, halo_scratch, dma_sem = refs
    b = pl.program_id(0)
    ti = pl.program_id(1)
    tj = pl.program_id(2)
    p = th * TILE_W

    # DMA schedule. The warp is DMA-row-issue-bound, not bandwidth- or
    # MAC-bound (measured: runtime is R-invariant and only weakly
    # C-dependent): a [C, Hh, Wh] halo window is C*Hh strided rows of just
    # Wh*itemsize bytes, and at ~10 ns/row the engine trails the MXU badly.
    #
    # strip mode: ONE DMA per tile ROW — the [C, Hh, Ws] strip covering all
    # nJ tiles (Ws = W + Wh - TILE_W). Same row count per DMA but nJ times
    # fewer DMAs, and each tile slices its halo out of VMEM at a 128-aligned
    # lane offset. Double-buffered across rows (slot = row % 2): row r+1's
    # strip streams while row r computes, so even the residual row-issue
    # cost overlaps the row's nJ matmuls.
    #
    # tile mode (strip doesn't fit VMEM): per-tile [C, Hh, Wh] halo windows,
    # double-buffered across grid steps when nbuf == 2.
    if strip:
        row = b * nI + ti
        slot = jax.lax.rem(row, nbuf) if nbuf > 1 else 0

        def start_strip_dma(rr, s):
            bb = rr // nI
            ii = jax.lax.rem(rr, nI)
            pltpu.make_async_copy(
                xpad_ref.at[bb, :, pl.ds(ii * th, Hh), :],
                halo_scratch.at[s],
                dma_sem.at[s],
            ).start()

        if nbuf == 1:
            @pl.when(tj == 0)
            def _():
                start_strip_dma(row, 0)
        else:
            @pl.when((row == 0) & (tj == 0))
            def _():
                start_strip_dma(0, 0)

            @pl.when((tj == 0) & (row + 1 < nB * nI))
            def _():
                start_strip_dma(row + 1, jax.lax.rem(row + 1, nbuf))

        # the wait is once per row (tj == 0); later tiles in the row run in
        # the same sequential grid after the wait has already passed
        @pl.when(tj == 0)
        def _():
            pltpu.make_async_copy(
                xpad_ref.at[b, :, pl.ds(ti * th, Hh), :],
                halo_scratch.at[slot],
                dma_sem.at[slot],
            ).wait()
    else:
        g = (b * nI + ti) * nJ + tj
        slot = jax.lax.rem(g, nbuf) if nbuf > 1 else 0

        def start_halo_dma(bb, ii, jj, s):
            # One 3-D DMA: the halo window. Padded-image coords offset by
            # +R cancel the -R halo origin, so windows start exactly at
            # (ii*th, jj*TILE_W) — plus the tile's vertical offset (and
            # only Hv rows travel) in v5 offset mode.
            if Hv:
                y0 = ii * th + offs_ref[bb, ii, jj] * 8
                rows = Hv
            else:
                y0 = ii * th
                rows = Hh
            pltpu.make_async_copy(
                xpad_ref.at[
                    bb, :, pl.ds(y0, rows), pl.ds(jj * TILE_W, Wh)
                ],
                halo_scratch.at[s],
                dma_sem.at[s],
            ).start()

        if nbuf == 1:
            start_halo_dma(b, ti, tj, 0)
        else:
            @pl.when(g == 0)
            def _():
                start_halo_dma(b, ti, tj, 0)

            @pl.when(g + 1 < nB * nI * nJ)
            def _():
                nxt = g + 1
                jn = jax.lax.rem(nxt, nJ)
                t = nxt // nJ
                in_ = jax.lax.rem(t, nI)
                bn = t // nI
                start_halo_dma(bn, in_, jn, jax.lax.rem(nxt, nbuf))

    flow = flow_ref[0, 0, 0].astype(jnp.float32)  # [2, P] (lane-major)

    # absolute output pixel coordinates from the flattened tile index
    pidx = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
    ii = (ti * th + pidx // TILE_W).astype(jnp.float32)  # [1, P]
    jj = (tj * TILE_W + pidx % TILE_W).astype(jnp.float32)
    fx = flow[0:1, :]
    fy = flow[1:2, :]

    if pixel_mode:
        # direct pixel displacements: source = output + flow (the SSF
        # warp_volume convention after unnormalizing its affine grid)
        sx = jnp.clip(jj + fx, 0.0, W - 1)
        sy = jnp.clip(ii + fy, 0.0, H - 1)
    else:
        # reference grid composition (ops/warp.py flow_warp): linspace grid
        # + flow*2/(size-1), unnormalized with align_corners=False, border
        gx = (-1.0 + jj * (2.0 / (W - 1))) + fx * (2.0 / (W - 1))
        gy = (-1.0 + ii * (2.0 / (H - 1))) + fy * (2.0 / (H - 1))
        sx = jnp.clip(((gx + 1.0) * W - 1.0) * 0.5, 0.0, W - 1)
        sy = jnp.clip(((gy + 1.0) * H - 1.0) * 0.5, 0.0, H - 1)

    # halo-relative coordinates [1, P]. In v5 offset mode the tile's
    # quantized vertical offset shifts the window: pixels whose vertical
    # source row deviates more than the residual window allows from the
    # tile's mean clamp to the window edge (|flow| <= R AND per-tile
    # vertical spread <= the Hv budget => exact).
    Hr = Hv or Hh
    if Hv:
        oy = (offs_ref[b, ti, tj] * 8).astype(jnp.float32)
    else:
        oy = 0.0
    hy = jnp.clip(sy - (ti * th - R) - oy, 0.0, Hr - 2.0)
    hx = jnp.clip(sx - (tj * TILE_W - R), 0.0, Wh - 2.0)

    # 2-tap lerp weights as relu(1 - |iota - coord|): weight (1-t) at
    # floor(coord) and t at floor(coord)+1, zero elsewhere — one compare-
    # free VPU expression instead of two eq/where pairs.
    # vertical Wr [Hr, P], horizontal Wc [Wh, P]
    hh = jax.lax.broadcasted_iota(jnp.int32, (Hr, p), 0).astype(jnp.float32)
    wr = jnp.maximum(1.0 - jnp.abs(hh - hy), 0.0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (Wh, p), 0).astype(jnp.float32)
    wc = jnp.maximum(1.0 - jnp.abs(xx - hx), 0.0)

    if not strip:
        # wait for THIS tile's halo (started by the previous grid step, or
        # by the warm-up branch above when g == 0)
        if Hv:
            src = xpad_ref.at[
                b, :,
                pl.ds(ti * th + offs_ref[b, ti, tj] * 8, Hv),
                pl.ds(tj * TILE_W, Wh),
            ]
        else:
            src = xpad_ref.at[
                b, :, pl.ds(ti * th, Hh), pl.ds(tj * TILE_W, Wh)
            ]
        pltpu.make_async_copy(
            src, halo_scratch.at[slot], dma_sem.at[slot]
        ).wait()

    if out_dtype == jnp.bfloat16:
        mm_dtype, mm_prec = jnp.bfloat16, None
    else:
        mm_dtype, mm_prec = jnp.float32, jax.lax.Precision.HIGHEST
    wc = wc.astype(mm_dtype)
    # channel-banded so the f32 F intermediate ([Hh, P], one channel at a
    # time) stays within VMEM; the output block is [C, P] (channels in
    # sublanes, tile pixels in lanes) so each channel lands as one
    # sublane-row write with no in-kernel transpose
    outs = []
    for c in range(C):
        if strip and Hv:
            # dynamic (8-aligned) sublane window + 128-aligned lane slice
            lhs = halo_scratch[
                slot, c,
                pl.ds(offs_ref[b, ti, tj] * 8, Hv),
                pl.ds(tj * TILE_W, Wh),
            ]
        elif strip:
            # 128-aligned dynamic lane slice straight off the VMEM ref
            lhs = halo_scratch[slot, c, :, pl.ds(tj * TILE_W, Wh)]
        else:
            lhs = halo_scratch[slot, c]
        f = jax.lax.dot_general(
            lhs.astype(mm_dtype),
            wc,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=mm_prec,
        )  # [Hh, P]
        outs.append(jnp.sum(wr * f, axis=0, keepdims=True))  # [1, P]
    out_ref[0, 0, 0] = jnp.concatenate(outs, axis=0).astype(out_dtype)


def _tile_h(H: int, W: int, C: int, R: int, itemsize: int) -> int:
    """Tile height. Pinned to TILE_H=8: taller tiles were hypothesized to
    win by cutting the halo's vertical read amplification (Hh/th source
    rows per output row — R=56: th=8 touches 128 halo rows per 8 output
    rows, th=32 only 152 per 32), but a chip sweep (tools/warp_bench.py,
    FVC_WARP_TH override) measured th=16 NO faster where it compiles
    (rgb 1080p R=56: 67 ms vs 65 ms at th=8) and scoped-VMEM OOM
    everywhere else (Mosaic's stack temporaries — the per-channel f32 E
    bands — scale with th and blow the 16 MB limit long before the
    scratch model predicts). The kernel is not halo-MAC-bound; th=8
    keeps every supported shape compiling with the strip DMA schedule."""
    forced = os.environ.get("FVC_WARP_TH", "")
    if forced:
        return int(forced)
    return TILE_H


RESIDUAL_R = 12  # v5 residual vertical half-window (rows around tile mean)


def _pallas_warp(
    img: jax.Array, flow: jax.Array, R: int, interpret: bool = False,
    pixel_mode: bool = False, s2d_io: bool = False, flow_s2d: bool = False,
) -> jax.Array:
    if s2d_io:
        # img is the SPACE-TO-DEPTH form [B, H/2, W/2, 4C] of the [B, H,
        # W, C] image actually being warped (flow stays full-res). The
        # d2s->planarize input chain and the untile->s2d output chain each
        # collapse into ONE relayout — chained 3-channel full-res permutes
        # ran at ~10% of HBM peak and were ~1/3 of the round-4 decode
        # graph's wall clock (xprof, VERDICT round-3 item 2).
        B, H2, W2, C4 = img.shape
        C = C4 // 4
        H, W = H2 * 2, W2 * 2
    else:
        B, H, W, C = img.shape
    th = _tile_h(H, W, C, R, img.dtype.itemsize)
    p = th * TILE_W
    # halo dims rounded to (8, 128) so VMEM scratch stays tile-aligned
    Hh = _round_up(th + 2 * R + 1, 8)
    Wh = _round_up(TILE_W + 2 * R + 1, TILE_W)
    nI, nJ = H // th, W // TILE_W

    # v5 offset mode: the horizontal halo is lane-locked at Wh for every
    # R <= 63, so only the vertical extent drives the (MAC-bound) matmul.
    # A per-tile vertical offset — the tile's mean vertical source row,
    # quantized to 8 (Mosaic sublane alignment) — selects an Hv-row
    # residual window; pixels deviating beyond it clamp to the window edge
    # (decoded/estimated flow fields are smooth at 8x128 granularity).
    Hv = _round_up(th + 2 * RESIDUAL_R + 1, 8)
    offset_mode = Hh - Hv >= 16

    # channel-planar padded source: [B, C, H + Hh - th, W + Wh - TILE_W]
    if s2d_io:
        # fused d2s + planarize: s2d channels are ordered (ry, rx, c)
        # (ops.warp.space_to_depth). Route through a DENSE channel-planar
        # intermediate: the single-transpose formulation
        # reshape(B,H2,W2,2,2,C)->transpose->reshape made XLA materialize
        # the 5-D view, whose trailing (2, C) dims tile-pad to (8, 128) —
        # a 4 ms copy+reshape pair at 1080p (round-5 HLO/xprof). Step 1
        # lands [B, 4C, H2, W2] (spatial trailing dims: unpadded); step 2
        # interleaves phases from the dense form.
        planar = (
            img.transpose(0, 3, 1, 2)
            .reshape(B, 2, 2, C, H2, W2)
            .transpose(0, 3, 4, 1, 5, 2)
            .reshape(B, C, H, W)
        )
    else:
        planar = img.transpose(0, 3, 1, 2)
    xpad = jnp.pad(
        planar,
        ((0, 0), (0, 0), (R, Hh - th - R), (R, Wh - TILE_W - R)),
        mode="edge",
    )
    # pre-tiled flow, lane-major: [B, nI, nJ, 2, P]
    if flow_s2d:
        # flow arrives in s2d phase form [B, H/2, W/2, 8] in C-MAJOR
        # order (channels [fx_p0..p3, fy_p0..p3], p = ry*2 + rx) — the
        # s2d-pipeline codecs' motion decoders emit phases, and
        # materializing the full-res [B,H,W,2] intermediate costs a ~4 ms
        # lane-padded relayout at 1080p (round-5 measurement); this
        # transpose lands the tile layout in one copy from the
        # channel-rich form instead.
        th2, TW2 = th // 2, TILE_W // 2
        flow_t = (
            flow.reshape(B, nI, th2, nJ, TW2, 2, 2, 2)
            .transpose(0, 1, 3, 5, 2, 6, 4, 7)
            .reshape(B, nI, nJ, 2, p)
        )
    else:
        flow_t = (
            flow.reshape(B, nI, th, nJ, TILE_W, 2)
            .transpose(0, 1, 3, 5, 2, 4)
            .reshape(B, nI, nJ, 2, p)
        )

    if offset_mode:
        # Per-tile vertical offsets, derived from the PRE-TILED flow so the
        # producer's d2s output keeps a single consumer layout (a reduce on
        # the raw flow made XLA materialize it twice, +13 ms at 1080p).
        # min/max of the vertical source coord decompose exactly: sy is a
        # monotone (clipped linear) map of z = ii + fy, and per tile
        # min(z) = ti*th + min_r(r + min_lane fy); the Hv window centres on
        # the tile MIDRANGE (min+max)/2 — strictly better coverage than the
        # mean — quantized to 8 rows (Mosaic sublane alignment).
        fy_t = flow_t[:, :, :, 1, :].astype(jnp.float32).reshape(
            B, nI, nJ, th, TILE_W
        )
        r_idx = jnp.arange(th, dtype=jnp.float32)
        zmin = (fy_t.min(axis=4) + r_idx).min(axis=3)  # [B, nI, nJ]
        zmax = (fy_t.max(axis=4) + r_idx).max(axis=3)
        ti_idx = jnp.arange(nI, dtype=jnp.float32)[None, :, None]
        zmin = zmin + ti_idx * th
        zmax = zmax + ti_idx * th
        if pixel_mode:
            sy_min = jnp.clip(zmin, 0.0, H - 1)
            sy_max = jnp.clip(zmax, 0.0, H - 1)
        else:
            sy_min = jnp.clip(zmin * (H / (H - 1)) - 0.5, 0.0, H - 1)
            sy_max = jnp.clip(zmax * (H / (H - 1)) - 0.5, 0.0, H - 1)
        oy = (sy_min + sy_max) * 0.5 + R - ti_idx * th - (Hv - 2) / 2
        offs = jnp.clip(
            jnp.round(oy / 8.0), 0.0, (Hh - Hv) // 8
        ).astype(jnp.int32)
    else:
        Hv = 0

    # DMA granularity + buffering (see _warp_kernel's schedule comment):
    # row strips double-buffered when two fit in VMEM (~16 MB/core, leaving
    # room for the f32 E band, weight matrices, and the out block);
    # otherwise per-tile halo windows (double-buffered when THOSE fit).
    Ws = W + Wh - TILE_W
    itemsize = img.dtype.itemsize
    if 2 * C * Hh * Ws * itemsize <= 10 * 2**20:
        strip, nbuf = True, 2
    elif C * Hh * Ws * itemsize <= 10 * 2**20:
        strip, nbuf = True, 1
    elif 2 * C * Hh * Wh * itemsize <= 10 * 2**20:
        strip, nbuf = False, 2
    else:
        strip, nbuf = False, 1
    kernel = functools.partial(
        _warp_kernel, R=R, H=H, W=W, C=C, Hh=Hh, Wh=Wh, out_dtype=img.dtype,
        pixel_mode=pixel_mode, nB=B, nI=nI, nJ=nJ, nbuf=nbuf, strip=strip,
        th=th, Hv=Hv,
    )
    scratch_rows = (Ws if strip else Wh)
    scratch_h = Hh if (strip or not Hv) else Hv
    scratch_shapes = [
        pltpu.VMEM((nbuf, C, scratch_h, scratch_rows), img.dtype),
        pltpu.SemaphoreType.DMA((nbuf,)),
    ]
    in_specs = [
        pl.BlockSpec(
            (1, 1, 1, 2, p),
            (lambda b, i, j, offs: (b, i, j, 0, 0)) if Hv
            else (lambda b, i, j: (b, i, j, 0, 0)),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(memory_space=pltpu.HBM),
    ]
    out_specs = pl.BlockSpec(
        (1, 1, 1, C, p),
        (lambda b, i, j, offs: (b, i, j, 0, 0)) if Hv
        else (lambda b, i, j: (b, i, j, 0, 0)),
        memory_space=pltpu.VMEM,
    )
    out_shape = jax.ShapeDtypeStruct((B, nI, nJ, C, p), img.dtype)
    if Hv:
        out = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(B, nI, nJ),
                in_specs=in_specs,
                out_specs=out_specs,
                scratch_shapes=scratch_shapes,
            ),
            out_shape=out_shape,
            interpret=interpret,
        )(offs, flow_t, xpad)
    else:
        out = pl.pallas_call(
            kernel,
            grid=(B, nI, nJ),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch_shapes,
            interpret=interpret,
        )(flow_t, xpad)
    # untile: [B, nI, nJ, C, P] -> [B, H, W, C] (or fused straight back to
    # the s2d layout — one relayout instead of untile + space_to_depth)
    if s2d_io:
        th2, TW2 = th // 2, TILE_W // 2
        out = out.reshape(B, nI, nJ, C, th2, 2, TW2, 2)
        return (
            out.transpose(0, 1, 4, 2, 6, 5, 7, 3)
            .reshape(B, H2, W2, 4 * C)
        )
    out = out.reshape(B, nI, nJ, C, th, TILE_W)
    return out.transpose(0, 1, 4, 2, 5, 3).reshape(B, H, W, C)


def _supported(img_shape, R: int = 56) -> bool:
    B, H, W, C = img_shape
    return (
        H % TILE_H == 0 and W % TILE_W == 0
        and W >= TILE_W and H >= TILE_H
        and C <= MAX_KERNEL_CHANNELS
        and R <= MAX_DISPLACEMENT_BOUND
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def pallas_flow_warp(img: jax.Array, flow: jax.Array, max_displacement: int = 56):
    """Bilinear backward warp with displacement bounded by max_displacement.

    Matches ops.warp.flow_warp exactly for |flow| <= max_displacement (plus,
    when the v5 offset mode is active at R >= ~20, per-tile vertical spread
    within the residual window budget — module docstring); larger motion
    clamps. Falls back to the XLA gather path for shapes the tiling cannot
    cover (small pyramid levels)."""
    from fastvideocodec_tpu.ops.warp import _xla_flow_warp as xla_flow_warp

    if not _supported(img.shape, max_displacement):
        return xla_flow_warp(img, flow)
    return _pallas_warp(img, flow, max_displacement)


def _pfw_fwd(img, flow, max_displacement):
    out = pallas_flow_warp(img, flow, max_displacement)
    return out, (img, flow)


def _pfw_bwd(max_displacement, res, g):
    # exact gradients via the XLA reference implementation (training uses
    # small crops where the gather path is acceptable; SURVEY.md §7)
    from fastvideocodec_tpu.ops.warp import _xla_flow_warp as xla_flow_warp

    img, flow = res
    _, vjp = jax.vjp(xla_flow_warp, img, flow)
    return vjp(g)


pallas_flow_warp.defvjp(_pfw_fwd, _pfw_bwd)


def _exact_fullres_s2d(img_s2d: jax.Array, flow: jax.Array) -> jax.Array:
    from fastvideocodec_tpu.ops.warp import (
        _xla_flow_warp,
        depth_to_space,
        space_to_depth,
    )

    return space_to_depth(
        _xla_flow_warp(depth_to_space(img_s2d, 2), flow), 2
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def pallas_flow_warp_s2d(img_s2d: jax.Array, flow: jax.Array,
                         max_displacement: int = 56):
    """Full-resolution bilinear warp consuming AND producing space-to-depth
    tensors: img_s2d [B, H/2, W/2, 4C], flow [B, H, W, 2] full-res pixels.

    Value-identical to space_to_depth(pallas_flow_warp(depth_to_space(
    img_s2d, 2), flow), 2); the layout conversions fuse into the kernel's
    planarize/untile relayouts (see _pallas_warp s2d_io)."""
    B, H2, W2, C4 = img_s2d.shape
    full_shape = (B, 2 * H2, 2 * W2, C4 // 4)
    if C4 % 4 or not _supported(full_shape, max_displacement):
        return _exact_fullres_s2d(img_s2d, flow)
    return _pallas_warp(img_s2d, flow, max_displacement, s2d_io=True)


def _pfws_fwd(img_s2d, flow, max_displacement):
    return pallas_flow_warp_s2d(img_s2d, flow, max_displacement), (img_s2d, flow)


def _pfws_bwd(max_displacement, res, g):
    img_s2d, flow = res
    _, vjp = jax.vjp(_exact_fullres_s2d, img_s2d, flow)
    return vjp(g)


pallas_flow_warp_s2d.defvjp(_pfws_fwd, _pfws_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def pallas_pixel_warp(img: jax.Array, flow_px: jax.Array,
                      max_displacement: int = 56):
    """Bilinear warp with DIRECT pixel displacements (source = output +
    flow), the convention ops.warp.warp_volume reaches after unnormalizing
    its half-pixel-centred affine grid. Same halo/one-hot kernel as
    pallas_flow_warp; displacements beyond the bound clamp."""
    from fastvideocodec_tpu.ops.warp import _xla_pixel_warp

    if not _supported(img.shape, max_displacement):
        return _xla_pixel_warp(img, flow_px)
    return _pallas_warp(img, flow_px, max_displacement, pixel_mode=True)


def _ppw_fwd(img, flow_px, max_displacement):
    return pallas_pixel_warp(img, flow_px, max_displacement), (img, flow_px)


def _ppw_bwd(max_displacement, res, g):
    from fastvideocodec_tpu.ops.warp import _xla_pixel_warp

    img, flow_px = res
    _, vjp = jax.vjp(_xla_pixel_warp, img, flow_px)
    return vjp(g)


pallas_pixel_warp.defvjp(_ppw_fwd, _ppw_bwd)


def _exact_pixel_fullres_s2d(img_s2d: jax.Array, flow_px: jax.Array) -> jax.Array:
    from fastvideocodec_tpu.ops.warp import (
        _xla_pixel_warp,
        depth_to_space,
        space_to_depth,
    )

    return space_to_depth(
        _xla_pixel_warp(depth_to_space(img_s2d, 2), flow_px), 2
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def pallas_pixel_warp_s2d(img_s2d: jax.Array, flow_px: jax.Array,
                          max_displacement: int = 56):
    """Full-resolution pixel-displacement warp consuming AND producing
    space-to-depth tensors: img_s2d [B, H/2, W/2, 4C], flow_px [B, H, W, 2]
    direct pixel displacements (source = output + flow).

    Value-identical to space_to_depth(pallas_pixel_warp(depth_to_space(
    img_s2d, 2), flow_px), 2); the layout round trips fuse into the
    kernel's planarize/untile relayouts (s2d_io mode). The pyramid
    scale-space warp's level-0 sample (ops.warp.warp_volume_pyramid_s2d)
    is the production call site."""
    B, H2, W2, C4 = img_s2d.shape
    full_shape = (B, 2 * H2, 2 * W2, C4 // 4)
    if C4 % 4 or not _supported(full_shape, max_displacement):
        return _exact_pixel_fullres_s2d(img_s2d, flow_px)
    return _pallas_warp(img_s2d, flow_px, max_displacement,
                        pixel_mode=True, s2d_io=True)


def _ppws_fwd(img_s2d, flow_px, max_displacement):
    return (pallas_pixel_warp_s2d(img_s2d, flow_px, max_displacement),
            (img_s2d, flow_px))


def _ppws_bwd(max_displacement, res, g):
    img_s2d, flow_px = res
    _, vjp = jax.vjp(_exact_pixel_fullres_s2d, img_s2d, flow_px)
    return vjp(g)


pallas_pixel_warp_s2d.defvjp(_ppws_fwd, _ppws_bwd)


def _exact_pixel_s2d_sflow(img_s2d: jax.Array, flow_s2d: jax.Array) -> jax.Array:
    from fastvideocodec_tpu.ops.warp import (
        _xla_pixel_warp,
        depth_to_space,
        space_to_depth,
    )

    # flow_s2d is c-major ([fx x4 phases, fy x4]); each 4-channel block is
    # a (ry, rx) phase set of one scalar field, so per-block d2s unpacks it
    flow_full = jnp.concatenate(
        [
            depth_to_space(flow_s2d[..., 0:4], 2),
            depth_to_space(flow_s2d[..., 4:8], 2),
        ],
        axis=-1,
    )
    return space_to_depth(
        _xla_pixel_warp(depth_to_space(img_s2d, 2), flow_full), 2
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def pallas_pixel_warp_s2d_sflow(img_s2d: jax.Array, flow_s2d: jax.Array,
                                max_displacement: int = 56):
    """pallas_pixel_warp_s2d with the FLOW also in s2d phase form:
    flow_s2d [B, H/2, W/2, 8] (channel order (ry, rx, c), c = (fx, fy),
    direct pixel displacements). Value-identical to feeding
    depth_to_space(flow_s2d, 2) to pallas_pixel_warp_s2d — but the
    full-resolution 2-channel flow tensor (whose lane padding makes it a
    ~4 ms relayout at 1080p) never materializes: the kernel pre-tiles the
    phase form directly."""
    B, H2, W2, C4 = img_s2d.shape
    full_shape = (B, 2 * H2, 2 * W2, C4 // 4)
    th = _tile_h(2 * H2, 2 * W2, C4 // 4, max_displacement,
                 img_s2d.dtype.itemsize)
    if (C4 % 4 or flow_s2d.shape[-1] != 8 or th % 2
            or not _supported(full_shape, max_displacement)):
        return _exact_pixel_s2d_sflow(img_s2d, flow_s2d)
    return _pallas_warp(img_s2d, flow_s2d, max_displacement,
                        pixel_mode=True, s2d_io=True, flow_s2d=True)


def _ppwss_fwd(img_s2d, flow_s2d, max_displacement):
    return (pallas_pixel_warp_s2d_sflow(img_s2d, flow_s2d, max_displacement),
            (img_s2d, flow_s2d))


def _ppwss_bwd(max_displacement, res, g):
    img_s2d, flow_s2d = res
    _, vjp = jax.vjp(_exact_pixel_s2d_sflow, img_s2d, flow_s2d)
    return vjp(g)


pallas_pixel_warp_s2d_sflow.defvjp(_ppwss_fwd, _ppwss_bwd)
