"""Pallas TPU kernel for bilinear backward warping.

Why: XLA lowers per-pixel gathers to element-at-a-time loads on TPU — a
single [4, 1024, 2048, 3] flow-warp measures ~1.4 s on a v5e chip, making
warping (the codec's hottest op: SPyNet levels + motion compensation,
SURVEY.md §2.9 'CUDA kernels -> Pallas') 99% of LSVC runtime.

Idea: express the warp as dense MXU math instead of random access. For an
(8, 128) output tile, every source pixel lies in a bounded halo around the
tile (|flow| clamped to max_displacement R). Bilinear sampling is then

    out[p, c] = sum_h sum_x Wr[p, h] * Wc[p, x] * halo[h, x, c]

where Wr[p, .] is a 2-tap vertical lerp one-hot and Wc[p, .] a horizontal
one. Computed as ONE MXU matmul E = Wr @ halo  ([P, Hh] @ [Hh, Wh*C])
followed by a VPU multiply-reduce over the halo width. ~200 MFLOP per tile
of 1024 pixels — two orders of magnitude faster than the gather.

Semantics match ops.warp.flow_warp (linspace grid + flow/(size-1)*2,
border padding, align_corners=False) exactly for |flow| <= R; larger
displacements clamp to R (configurable). Backward pass falls back to the
XLA implementation via custom_vjp, so training gradients are exact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 8
TILE_W = 128


def _warp_kernel(flow_ref, halo_ref, out_ref, *, R, H, W, C, Hh, Wh, out_dtype):
    ti = pl.program_id(1)
    tj = pl.program_id(2)

    flow = flow_ref[...].astype(jnp.float32)  # [TILE_H, TILE_W, 2]

    # absolute output pixel coordinates
    row0 = ti * TILE_H
    col0 = tj * TILE_W
    ii = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0).astype(
        jnp.float32
    ) + row0
    jj = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1).astype(
        jnp.float32
    ) + col0

    # reference grid composition (ops/warp.py flow_warp):
    # g = linspace(-1,1)[j] + f * 2/(size-1); src = ((g+1)*size - 1)/2,
    # then border clamp.
    gx = (-1.0 + jj * (2.0 / (W - 1))) + flow[..., 0] * (2.0 / (W - 1))
    gy = (-1.0 + ii * (2.0 / (H - 1))) + flow[..., 1] * (2.0 / (H - 1))
    sx = jnp.clip(((gx + 1.0) * W - 1.0) * 0.5, 0.0, W - 1)
    sy = jnp.clip(((gy + 1.0) * H - 1.0) * 0.5, 0.0, H - 1)

    # halo-relative coordinates; halo spans rows [row0-R, row0+TILE_H+R]
    # and cols [col0-R, col0+TILE_W+R] of the edge-padded image.
    hy = jnp.clip(sy - (row0 - R), 0.0, Hh - 2.0)
    hx = jnp.clip(sx - (col0 - R), 0.0, Wh - 2.0)

    y0 = jnp.floor(hy)   # [TILE_H, TILE_W]
    x0 = jnp.floor(hx)
    ty = hy - y0
    tx = hx - x0

    # Mosaic restriction: no reshapes across sublane/lane dims — keep all
    # tensors 2D and unroll the 8 output rows (static python loop).
    # Channels are concatenated along the halo's lane axis ([Hh, C*Wh]) so
    # each row needs ONE [TILE_W, Hh] @ [Hh, C*Wh] MXU matmul.
    hh = jax.lax.broadcasted_iota(jnp.int32, (Hh, TILE_W), 0).astype(jnp.float32)
    xx = jax.lax.broadcasted_iota(jnp.int32, (TILE_W, Wh), 1).astype(jnp.float32)
    if out_dtype == jnp.bfloat16:
        mm_dtype, mm_prec = jnp.bfloat16, None
    else:
        mm_dtype, mm_prec = jnp.float32, jax.lax.Precision.HIGHEST
    halo = halo_ref[...].astype(mm_dtype)  # [Hh, C*Wh]
    for r in range(TILE_H):
        y0r = y0[r : r + 1, :]          # [1, TILE_W]
        tyr = ty[r : r + 1, :]
        # vertical lerp matrix Wr^T [Hh, TILE_W]
        wrt = jnp.where(hh == y0r, 1.0 - tyr, 0.0) + jnp.where(
            hh == y0r + 1.0, tyr, 0.0
        )
        x0r = x0[r : r + 1, :].T        # [TILE_W, 1]
        txr = tx[r : r + 1, :].T
        # horizontal lerp weights [TILE_W, Wh]
        wcr = jnp.where(xx == x0r, 1.0 - txr, 0.0) + jnp.where(
            xx == x0r + 1.0, txr, 0.0
        )
        e = jax.lax.dot_general(
            wrt.astype(mm_dtype),
            halo,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=mm_prec,
        )  # [TILE_W, C*Wh]
        for c in range(C):
            out_rc = jnp.sum(wcr * e[:, c * Wh : (c + 1) * Wh], axis=1)
            out_ref[c, r, :] = out_rc.astype(out_dtype)


def _warp_kernel_entry(flow_ref, xpad_ref, out_ref, halo_scratch, dma_sem, *,
                       R, H, W, C, Hh, Wh, out_dtype):
    b = pl.program_id(0)
    ti = pl.program_id(1)
    tj = pl.program_id(2)
    # DMA each channel plane of the halo window into its lane band of the
    # [Hh, C*Wh] scratch: padded image coords offset by +R cancel the -R
    # halo origin, so windows start exactly at (ti*TILE_H, tj*TILE_W).
    copies = [
        pltpu.make_async_copy(
            xpad_ref.at[b, c, pl.ds(ti * TILE_H, Hh), pl.ds(tj * TILE_W, Wh)],
            halo_scratch.at[:, pl.ds(c * Wh, Wh)],
            dma_sem.at[c],
        )
        for c in range(C)
    ]
    for cp in copies:
        cp.start()
    for cp in copies:
        cp.wait()
    _warp_kernel(
        flow_ref.at[0], halo_scratch, out_ref.at[0],
        R=R, H=H, W=W, C=C, Hh=Hh, Wh=Wh, out_dtype=out_dtype,
    )


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _pallas_warp(img: jax.Array, flow: jax.Array, R: int) -> jax.Array:
    B, H, W, C = img.shape
    # halo dims rounded to the (8, 128) tile so VMEM scratch stays aligned
    Hh = _round_up(TILE_H + 2 * R + 1, TILE_H)
    Wh = _round_up(TILE_W + 2 * R + 1, TILE_W)
    # channel-planar padded source: [B, C, H + Hh - TILE_H, W + Wh - TILE_W]
    xpad = jnp.pad(
        img.transpose(0, 3, 1, 2),
        ((0, 0), (0, 0), (R, Hh - TILE_H - R), (R, Wh - TILE_W - R)),
        mode="edge",
    )
    grid = (B, H // TILE_H, W // TILE_W)
    kernel = functools.partial(
        _warp_kernel_entry, R=R, H=H, W=W, C=C, Hh=Hh, Wh=Wh, out_dtype=img.dtype
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, TILE_H, TILE_W, 2),
                lambda b, i, j: (b, i, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(
            (1, C, TILE_H, TILE_W),
            lambda b, i, j: (b, 0, i, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, C, H, W), img.dtype),
        scratch_shapes=[
            pltpu.VMEM((Hh, C * Wh), img.dtype),
            pltpu.SemaphoreType.DMA((C,)),
        ],
    )(flow, xpad)
    return out.transpose(0, 2, 3, 1)


def _supported(img_shape, R: int) -> bool:
    B, H, W, C = img_shape
    return H % TILE_H == 0 and W % TILE_W == 0 and W >= TILE_W and H >= TILE_H


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def pallas_flow_warp(img: jax.Array, flow: jax.Array, max_displacement: int = 56):
    """Bilinear backward warp with displacement bounded by max_displacement.

    Matches ops.warp.flow_warp exactly for |flow| <= max_displacement;
    larger motion clamps. Falls back to the XLA gather path for shapes the
    tiling cannot cover (small pyramid levels)."""
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
