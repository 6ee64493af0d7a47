"""Warping / resampling ops (NHWC, XLA-friendly).

Replicates the exact sampling semantics the reference depends on:

- ``flow_warp``: torch ``grid_sample(bilinear, padding_mode='border',
  align_corners=False)`` over a linspace(-1,1) base grid with flow
  normalized by (size-1)/2 (reference models.py:730-752).
- ``bilinear_upsample_x2`` (align_corners=False, models.py:754-760) and
  ``bilinear_upsample_x2_ac`` (align_corners=True, models.py:761-765).
- scale-space volume construction + trilinear volume warping used by the
  SSF family (compressai ScaleSpaceFlow.forward_prediction, inherited at
  reference models.py:1876, 2254).

All ops are pure jnp (gathers + matmuls) so XLA can fuse them; shapes are
static under jit.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def _unnormalize(coord: jax.Array, size: int, align_corners: bool) -> jax.Array:
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1)
    return ((coord + 1.0) * size - 1.0) * 0.5


def grid_sample_bilinear(
    img: jax.Array,
    grid: jax.Array,
    *,
    padding_mode: str = "border",
    align_corners: bool = False,
) -> jax.Array:
    """torch.nn.functional.grid_sample for NHWC images.

    img: [B, H, W, C]; grid: [B, Ho, Wo, 2] with normalized (x, y) in [-1, 1].
    Only 'border' and 'zeros' padding are implemented (the reference only
    uses 'border').
    """
    B, H, W, C = img.shape
    gx = _unnormalize(grid[..., 0], W, align_corners)
    gy = _unnormalize(grid[..., 1], H, align_corners)

    if padding_mode == "border":
        gx = jnp.clip(gx, 0.0, W - 1)
        gy = jnp.clip(gy, 0.0, H - 1)

    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    tx = gx - x0
    ty = gy - y0

    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    x1i = jnp.clip(x0i + 1, 0, W - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    y1i = jnp.clip(y0i + 1, 0, H - 1)

    Ho, Wo = grid.shape[1], grid.shape[2]
    # TPU layout note: gather with channel-minor operands forces a lane
    # dimension of size C (3 for RGB), which XLA pads to 128 — a 42x HBM
    # blow-up at 1080p. Keep the flattened PIXEL axis minor (lane) and C on
    # sublanes instead: [B, C, H*W] -> gather N -> [B, C, Ho*Wo].
    flat = img.transpose(0, 3, 1, 2).reshape(B, C, H * W)

    def gather(yi, xi):
        idx = (yi * W + xi).reshape(B, 1, Ho * Wo)
        idx = jnp.broadcast_to(idx, (B, C, Ho * Wo))
        return jnp.take_along_axis(flat, idx, axis=2)  # [B, C, Ho*Wo]

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x1i)
    v10 = gather(y1i, x0i)
    v11 = gather(y1i, x1i)

    tx = tx.reshape(B, 1, Ho * Wo).astype(img.dtype)
    ty = ty.reshape(B, 1, Ho * Wo).astype(img.dtype)
    top = v00 * (1 - tx) + v01 * tx
    bot = v10 * (1 - tx) + v11 * tx
    out = (top * (1 - ty) + bot * ty).reshape(B, C, Ho, Wo).transpose(0, 2, 3, 1)

    if padding_mode == "zeros":
        inb = (
            (grid[..., 0] >= -1.0) & (grid[..., 0] <= 1.0)
            & (grid[..., 1] >= -1.0) & (grid[..., 1] <= 1.0)
        )
        out = out * inb[..., None].astype(img.dtype)
    return out


def base_grid(B: int, H: int, W: int, dtype=jnp.float32) -> jax.Array:
    """linspace(-1,1) mesh grid, channel order (x, y) — models.py:735-737."""
    xs = jnp.linspace(-1.0, 1.0, W, dtype=dtype)
    ys = jnp.linspace(-1.0, 1.0, H, dtype=dtype)
    gx, gy = jnp.meshgrid(xs, ys)  # [H, W]
    g = jnp.stack([gx, gy], axis=-1)  # [H, W, 2]
    return jnp.broadcast_to(g[None], (B, H, W, 2))


PALLAS_WARP_MAX_DISPLACEMENT = 56

# When set (via exact_warp()), flow_warp always takes the XLA gather path.
# The Pallas kernel clamps |flow| and differs in the last ulp from the
# gather path, so a bitstream ENCODED with one backend must be DECODED with
# the same semantics or the decode==encode-recon invariant breaks; the
# real-bitstream coder paths (coder/video.py) therefore force the exact
# path on both sides regardless of backend/shape.
_FORCE_EXACT_WARP = False


class exact_warp:
    """Context manager: force the backend-independent XLA warp path."""

    def __enter__(self):
        global _FORCE_EXACT_WARP
        self._prev = _FORCE_EXACT_WARP
        _FORCE_EXACT_WARP = True
        return self

    def __exit__(self, *exc):
        global _FORCE_EXACT_WARP
        _FORCE_EXACT_WARP = self._prev
        return False


def flow_warp(
    img: jax.Array, flow: jax.Array, max_displacement: int | None = None
) -> jax.Array:
    """Bilinear backward warp (reference torch_warp, models.py:732-741).

    img: [B, H, W, C]; flow: [B, H, W, 2] in pixels (x-displacement,
    y-displacement). Flow is normalized by (size-1)/2 and added to a
    linspace(-1,1) base grid; sampled with border padding,
    align_corners=False — matching torch defaults used by the reference.

    On TPU, shapes divisible by the (8, 128) tile dispatch to the Pallas
    MXU kernel (ops/pallas/warp_kernel.py) — far faster than the XLA
    gather at 1080p; displacements clamp at `max_displacement` pixels
    there (default PALLAS_WARP_MAX_DISPLACEMENT; the XLA path is
    unbounded). Call sites with known-small motion (e.g. trained MC warps)
    should pass a smaller bound — the kernel's halo DMA and one-hot matmul
    both scale with it.
    """
    r = PALLAS_WARP_MAX_DISPLACEMENT if max_displacement is None else max_displacement
    return _flow_warp_dispatch(img, flow, exact=_FORCE_EXACT_WARP, r=r)


# The exact flag must be part of the jit cache key: jax shares one trace
# cache across every `jax.jit(flow_warp)` wrapper, so a module-global read
# at trace time would be frozen by whichever mode traced first. A nested
# jit with a static argname keys the two paths separately (and is inlined
# when tracing under an outer jit).
@functools.partial(jax.jit, static_argnames=("exact", "r"))
def _flow_warp_dispatch(img: jax.Array, flow: jax.Array, *, exact: bool, r: int):
    if not exact and jax.default_backend() == "tpu":
        from fastvideocodec_tpu.ops.pallas.warp_kernel import (
            _supported,
            pallas_flow_warp,
        )

        if _supported(img.shape, r):
            return pallas_flow_warp(img, flow, r)
    return _xla_flow_warp(img, flow)


def flow_warp_fullres_s2d(
    img_s2d: jax.Array, flow: jax.Array, max_displacement: int | None = None
) -> jax.Array:
    """flow_warp of a FULL-resolution image carried in its space-to-depth
    form: img_s2d [B, H/2, W/2, 4C], flow [B, H, W, 2] full-res pixels;
    returns the warped image, still in s2d form.

    Value-identical to space_to_depth(flow_warp(depth_to_space(img_s2d,
    2), flow), 2) — the s2d-domain codecs' full-res MC warp
    (models/lsvc.py full_res_warp). On the TPU kernel path the layout
    round trips fuse into the kernel's own planarize/untile relayouts:
    the chained 3-channel full-res permutes ran at ~10% of HBM peak and
    were ~1/3 of the round-4 decode graph (xprof)."""
    r = PALLAS_WARP_MAX_DISPLACEMENT if max_displacement is None else max_displacement
    return _flow_warp_s2d_dispatch(img_s2d, flow, exact=_FORCE_EXACT_WARP, r=r)


@functools.partial(jax.jit, static_argnames=("exact", "r"))
def _flow_warp_s2d_dispatch(img_s2d, flow, *, exact: bool, r: int):
    if not exact and jax.default_backend() == "tpu":
        from fastvideocodec_tpu.ops.pallas.warp_kernel import (
            pallas_flow_warp_s2d,
        )

        return pallas_flow_warp_s2d(img_s2d, flow, r)
    return space_to_depth(_xla_flow_warp(depth_to_space(img_s2d, 2), flow), 2)


def _xla_flow_warp(img: jax.Array, flow: jax.Array) -> jax.Array:
    """Gather-based reference implementation (exact, unbounded flow).

    Coordinate math runs in float32 regardless of input dtype: a bf16
    normalized grid has ~1-pixel ulp at 1080p widths, which turns the warp
    into garbage (and diverges from the Pallas kernel, which always builds
    coordinates in f32). The gathered VALUES stay in the image dtype.
    """
    B, H, W, _ = flow.shape
    norm = jnp.array([2.0 / max(W - 1, 1), 2.0 / max(H - 1, 1)], dtype=jnp.float32)
    grid = base_grid(B, H, W, dtype=jnp.float32) + flow.astype(jnp.float32) * norm
    return grid_sample_bilinear(img, grid, padding_mode="border", align_corners=False)


def _resize_matrix_ac(in_size: int, out_size: int) -> np.ndarray:
    """Interpolation weights for bilinear resize with align_corners=True."""
    w = np.zeros((out_size, in_size), dtype=np.float32)
    if out_size == 1 or in_size == 1:
        w[:, 0] = 1.0
        return w
    scale = (in_size - 1) / (out_size - 1)
    for i in range(out_size):
        src = i * scale
        lo = int(math.floor(src))
        hi = min(lo + 1, in_size - 1)
        t = src - lo
        w[i, lo] += 1 - t
        w[i, hi] += t
    return w


def _two_tap_indices(in_size: int, out_size: int, align_corners: bool):
    """Static source indices + weights for 1D bilinear resize."""
    o = np.arange(out_size, dtype=np.float64)
    if align_corners:
        src = o * ((in_size - 1) / max(out_size - 1, 1)) if out_size > 1 else o * 0
    else:
        src = np.clip((o + 0.5) * (in_size / out_size) - 0.5, 0.0, in_size - 1)
    lo = np.floor(src).astype(np.int32)
    hi = np.minimum(lo + 1, in_size - 1)
    t = (src - lo).astype(np.float32)
    return lo, hi, t


def _resize_axis_x2(x: jax.Array, axis: int, align_corners: bool) -> jax.Array:
    """2-tap bilinear x2 along one spatial axis, TPU-friendly.

    For x2 (either corner convention) even outputs interpolate (i-1, i) and
    odd outputs (i, i+1), so the resize is two shifted lerps interleaved —
    pure elementwise ops + a dim-merge reshape. (A dense [out, in]
    interpolation matrix costs O(H) FLOPs per output pixel — terabytes at
    1080p — and per-element gathers are ~10x slower than this on TPU.)"""
    size = x.shape[axis]
    lo, hi, t = _two_tap_indices(size, 2 * size, align_corners)
    i = np.arange(size)
    # the 2-shift structure this implementation relies on (static check)
    assert ((lo[0::2] == i - 1) | (lo[0::2] == i)).all(), "even taps not (i-1, i)"
    assert (lo[1::2] == i).all(), "odd taps not (i, i+1)"

    x_prev = jnp.concatenate(
        [jax.lax.slice_in_dim(x, 0, 1, axis=axis),
         jax.lax.slice_in_dim(x, 0, size - 1, axis=axis)], axis=axis
    )
    x_next = jnp.concatenate(
        [jax.lax.slice_in_dim(x, 1, size, axis=axis),
         jax.lax.slice_in_dim(x, size - 1, size, axis=axis)], axis=axis
    )

    shape = [1] * x.ndim
    shape[axis] = size
    dt = x.dtype

    # even outputs: taps (lo=i-1, hi=i) with weight t_even on hi — except
    # where lo==i (t==0 edge rows), handled by weights below
    t_even = t[0::2].astype(np.float32)
    lo_even_is_self = (lo[0::2] == i).astype(np.float32)
    # value = (1-t)*x[lo] + t*x[hi]; when lo==i(-1 clamped) both taps == x
    w_even_prev = ((1 - t_even) * (1 - lo_even_is_self)).reshape(shape)
    w_even_self = (t_even + (1 - t_even) * lo_even_is_self).reshape(shape)
    even = x_prev * jnp.asarray(w_even_prev, dt) + x * jnp.asarray(w_even_self, dt)

    # odd outputs: taps (lo=i, hi=i+1 clamped)
    t_odd = t[1::2].astype(np.float32)
    w_odd_self = (1 - t_odd).reshape(shape)
    w_odd_next = t_odd.reshape(shape)
    odd = x * jnp.asarray(w_odd_self, dt) + x_next * jnp.asarray(w_odd_next, dt)

    stacked = jnp.stack([even, odd], axis=axis + 1)  # [..., size, 2, ...]
    new_shape = list(x.shape)
    new_shape[axis] = 2 * size
    return stacked.reshape(new_shape)


def _bilinear_upsample_x2_interleave(x: jax.Array) -> jax.Array:
    """Shift+interleave formulation (autodiff-friendly, used for the VJP)."""
    return _resize_axis_x2(_resize_axis_x2(x, 1, False), 2, False)


def bilinear_upsample_x2(x: jax.Array) -> jax.Array:
    """x2 bilinear, align_corners=False (reference bilinearupsacling).

    torch `interpolate(mode='bilinear')` uses half-pixel centers; for x2
    that's a periodic 2-tap pattern — two shifted lerps interleaved per
    axis (edges clamped), which XLA fuses into one elementwise pass. An
    earlier depthwise input-dilated-conv formulation measured 1.6 ms per
    half->full 1080p pass on a v5e vs ~0.1 ms for this one (grouped convs
    at C=3 waste 125/128 MXU lanes per group), needed edge fixups AND a
    custom VJP (grouped input-dilated convs have no reverse-mode rule);
    the interleave autodiffs natively.
    """
    return _bilinear_upsample_x2_interleave(x)


def bilinear_upsample_x2_ac(x: jax.Array) -> jax.Array:
    """x2 bilinear, align_corners=True (reference bilinearupsacling2)."""
    return _resize_axis_x2(_resize_axis_x2(x, 1, True), 2, True)


@jax.custom_vjp
def avg_pool2(x: jax.Array) -> jax.Array:
    """2x2 average pool, stride 2 (torch F.avg_pool2d defaults).

    reduce_window is TPU-native (a reshape-mean forces a full relayout);
    the generic reduce_window primitive has no reverse-mode rule, so the
    VJP spreads each cotangent over its 2x2 window explicitly."""
    s = jax.lax.reduce_window(
        x, jnp.zeros((), x.dtype), jax.lax.add,
        (1, 2, 2, 1), (1, 2, 2, 1), "VALID",
    )
    return s * jnp.asarray(0.25, x.dtype)


def space_to_depth(x: jax.Array, r: int = 2) -> jax.Array:
    """[B, H, W, C] -> [B, H/r, W/r, C*r*r] (pixel phases into channels).

    The stem of the TPU-native codec variants: full-resolution convs at
    C=3 starve the MXU's 128-wide lanes, so the LSVC-TPU config folds a
    2x2 pixel block into 12 channels and runs the whole codec at half
    resolution (ROADMAP round-2 item 1). Pure reshape/transpose — XLA
    lowers it to a relayout, and MSE/PSNR over the s2d tensor equal the
    full-resolution values exactly (it is a permutation)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // r, r, W // r, r, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // r, W // r, C * r * r)


def depth_to_space(x: jax.Array, r: int = 2) -> jax.Array:
    """Inverse of space_to_depth: [B, H, W, C*r*r] -> [B, H*r, W*r, C]."""
    B, H, W, Crr = x.shape
    C = Crr // (r * r)
    x = x.reshape(B, H, W, r, r, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H * r, W * r, C)


def _avg_pool2_fwd(x):
    return avg_pool2(x), None


def _avg_pool2_bwd(_, g):
    g = g * jnp.asarray(0.25, g.dtype)
    g = jnp.repeat(jnp.repeat(g, 2, axis=1), 2, axis=2)
    return (g,)


avg_pool2.defvjp(_avg_pool2_fwd, _avg_pool2_bwd)


# ---------------------------------------------------------------------------
# Scale-space flow (SSF) volume ops
# ---------------------------------------------------------------------------


def gaussian_kernel1d(kernel_size: int, sigma: float) -> np.ndarray:
    half = (kernel_size - 1) * 0.5
    x = np.arange(kernel_size, dtype=np.float64) - half
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(x: jax.Array, sigma: float, kernel_size: int | None = None) -> jax.Array:
    """Separable gaussian blur with replicate (edge) padding.

    Matches compressai.models.utils.gaussian_blur semantics used to build
    the SSF scale-space volume — but as a shifted-add tap chain, not a
    depthwise conv: feature_group_count=C convs at C=3 measured 4.7 ms
    per full-res 1080p pass on a v5e (the MXU path wastes 125/128 lanes
    per group), while the fused elementwise tap chain measures ~0.5 ms
    with bitwise-identical bf16 output. Autodiffs natively (pad/slice
    have rules), so no custom VJP is needed.
    """
    if kernel_size is None:
        kernel_size = 2 * int(math.ceil(3 * sigma)) + 1
    k = gaussian_kernel1d(kernel_size, sigma)
    pad = kernel_size // 2

    def tap_sum(v, axis):
        n = v.shape[axis]
        cfg = [(0, 0)] * v.ndim
        cfg[axis] = (pad, pad)
        vp = jnp.pad(v, cfg, mode="edge")
        return sum(
            jnp.asarray(k[t], v.dtype)
            * jax.lax.slice_in_dim(vp, t, t + n, axis=axis)
            for t in range(kernel_size)
        )

    return tap_sum(tap_sum(x, 1), 2)


def gaussian_volume(x: jax.Array, sigma0: float, num_levels: int) -> jax.Array:
    """Scale-space volume as a FLAT channel stack [B, H, W, D*C] with
    D = num_levels + 1 (level d occupies channels d*C..(d+1)*C).

    Level 0 is x itself; level 1 is blur(x); deeper levels are built by
    avg-pool downsampling, blurring and bilinear re-upsampling — mirroring
    compressai ScaleSpaceFlow.gaussian_volume. The stack is a channel
    CONCAT, not a 5-D [B, H, W, D, C] tensor: XLA tiles the last two dims
    to (8, 128), so a 5-D volume's (D=6, C=3) trailing dims pad 6->8 and
    3->128 — a ~50x physical blowup that made every producer/consumer
    reshape a multi-ms HBM pass at 1080p (xprof, round 5).
    """
    levels = [x]
    cur = gaussian_blur(x, sigma0)
    levels.append(cur)
    for i in range(1, num_levels):
        cur = avg_pool2(cur)
        cur = gaussian_blur(cur, sigma0)
        interp = cur
        for _ in range(i):
            interp = bilinear_upsample_x2(interp)
        levels.append(interp)
    return jnp.concatenate(levels, axis=-1)


def _xla_pixel_warp(img: jax.Array, flow_px: jax.Array) -> jax.Array:
    """Bilinear warp with direct pixel displacements (source = output +
    flow). Gather-based exact path; coordinate math in f32."""
    B, H, W, _ = flow_px.shape
    jj = jnp.arange(W, dtype=jnp.float32)
    ii = jnp.arange(H, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(jj, ii)
    f = flow_px.astype(jnp.float32)
    sx = gx[None] + f[..., 0]
    sy = gy[None] + f[..., 1]
    # pixel coords -> align_corners=False normalized grid: g = (2s+1)/N - 1
    grid = jnp.stack(
        [(2.0 * sx + 1.0) / W - 1.0, (2.0 * sy + 1.0) / H - 1.0], axis=-1
    )
    return grid_sample_bilinear(img, grid, padding_mode="border",
                                align_corners=False)


@functools.partial(jax.jit, static_argnames=("exact", "r"))
def _pixel_warp_dispatch(img, flow_px, *, exact: bool, r: int):
    if not exact and jax.default_backend() == "tpu":
        from fastvideocodec_tpu.ops.pallas.warp_kernel import (
            _supported,
            pallas_pixel_warp,
        )

        if _supported(img.shape, r):
            return pallas_pixel_warp(img, flow_px, r)
    return _xla_pixel_warp(img, flow_px)


def warp_volume(
    volume: jax.Array, flow: jax.Array, scale_field: jax.Array,
    num_levels: int | None = None,
) -> jax.Array:
    """Trilinear sample of the scale-space volume (compressai warp_volume).

    volume: [B, H, W, D*C] flat channel stack from `gaussian_volume`
    (D = num_levels + 1 depth levels, C = D*C // D colors; pass
    ``num_levels`` when C != 3); flow: [B, H, W, 2] in *normalized* units
    (added directly to the affine base grid, align_corners=False);
    scale_field: [B, H, W, 1] normalized depth coordinate in [-1, 1].

    The xy sample of all D levels dispatches to the Pallas warp kernel on
    TPU (depth levels ride as channels; unnormalizing the half-pixel-
    centred affine grid gives source = output + flow*size/2 exactly, the
    kernel's pixel mode) — the SSF family's hottest eval op would otherwise
    hit XLA's per-element gathers. exact_warp() forces the gather path.
    The depth lerp is a slice-sum over level channel groups (elementwise,
    fuses) — an einsum over a 5-D [B,H,W,D,C] view pays the (8,128)
    trailing-dim tile padding, ~50x physical blowup at C=3.
    """
    B, H, W, DC = volume.shape
    D = (num_levels + 1) if num_levels is not None else 6
    C = DC // D
    flow_px = flow.astype(jnp.float32) * jnp.asarray(
        [W / 2.0, H / 2.0], jnp.float32
    )
    sampled = _pixel_warp_dispatch(
        volume, flow_px, exact=_FORCE_EXACT_WARP, r=PALLAS_WARP_MAX_DISPLACEMENT
    )

    # depth coordinate: unnormalize with align_corners=False, border clamp
    z = ((scale_field + 1.0) * D - 1.0) * 0.5  # [B,H,W,1]
    z = jnp.clip(z, 0.0, D - 1)
    out = None
    for d in range(D):
        wd = jnp.maximum(0.0, 1.0 - jnp.abs(z - d)).astype(volume.dtype)
        term = wd * sampled[..., d * C:(d + 1) * C]
        out = term if out is None else out + term
    return out


@functools.partial(jax.jit, static_argnames=("exact", "r"))
def _pixel_warp_s2d_dispatch(img_s2d, flow_px, *, exact: bool, r: int):
    if not exact and jax.default_backend() == "tpu":
        from fastvideocodec_tpu.ops.pallas.warp_kernel import (
            pallas_pixel_warp_s2d,
        )

        return pallas_pixel_warp_s2d(img_s2d, flow_px, r)
    return space_to_depth(
        _xla_pixel_warp(depth_to_space(img_s2d, 2), flow_px), 2
    )


@functools.partial(jax.jit, static_argnames=("exact", "r"))
def _pixel_warp_s2d_sflow_dispatch(img_s2d, flow_s2d, *, exact: bool, r: int):
    """img AND flow in s2d phase form (flow_s2d [B, H/2, W/2, 8] in
    c-major phase order [fx x4, fy x4], direct pixel displacements) —
    the full-res 2-channel flow tensor never materializes on the kernel
    path."""
    if not exact and jax.default_backend() == "tpu":
        from fastvideocodec_tpu.ops.pallas.warp_kernel import (
            pallas_pixel_warp_s2d_sflow,
        )

        return pallas_pixel_warp_s2d_sflow(img_s2d, flow_s2d, r)
    from fastvideocodec_tpu.ops.pallas.warp_kernel import (
        _exact_pixel_s2d_sflow,
    )

    return _exact_pixel_s2d_sflow(img_s2d, flow_s2d)


def s2d_phase_mean(x_s2d: jax.Array, channels: int) -> jax.Array:
    """Mean over the four s2d phases: [B, H/2, W/2, 4C] -> [B, H/2, W/2, C].

    Equals avg_pool2 of the full-resolution image (the s2d channel order
    is (ry, rx, c), so phase p occupies channels p*C..(p+1)*C). Pure
    slice-sum — no 5-D reshape (trailing-dim tile padding, see
    gaussian_volume)."""
    C = channels
    return (
        x_s2d[..., 0 * C:1 * C] + x_s2d[..., 1 * C:2 * C]
        + x_s2d[..., 2 * C:3 * C] + x_s2d[..., 3 * C:4 * C]
    ) * jnp.asarray(0.25, x_s2d.dtype)


def up2_to_s2d(x: jax.Array) -> jax.Array:
    """bilinear_upsample_x2 emitted directly in space-to-depth form:
    [B, H, W, C] -> [B, H, W, 4C] whose d2s equals the full-res upsample.

    The x2 align_corners=False taps are periodic (even out = 0.25*prev +
    0.75*self, odd = 0.75*self + 0.25*next, edges clamped), so each of
    the four output phases is one shifted lerp — elementwise, fuses, and
    never materializes a full-resolution thin-channel tensor."""

    def taps(v, axis):
        n = v.shape[axis]
        prev = jnp.concatenate(
            [jax.lax.slice_in_dim(v, 0, 1, axis=axis),
             jax.lax.slice_in_dim(v, 0, n - 1, axis=axis)], axis)
        nxt = jnp.concatenate(
            [jax.lax.slice_in_dim(v, 1, n, axis=axis),
             jax.lax.slice_in_dim(v, n - 1, n, axis=axis)], axis)
        q1, q3 = jnp.asarray(0.25, v.dtype), jnp.asarray(0.75, v.dtype)
        return q1 * prev + q3 * v, q3 * v + q1 * nxt

    even_h, odd_h = taps(x, 1)
    ph = []
    for vh in (even_h, odd_h):          # ry = 0, 1
        even_w, odd_w = taps(vh, 2)
        ph.extend([even_w, odd_w])      # rx = 0, 1
    return jnp.concatenate(ph, axis=-1)  # (ry, rx, c) order


def gaussian_volume_pyramid(x: jax.Array, sigma0: float, num_levels: int):
    """Pyramid scale-space volume: (level0, vol_half) where level0 = x
    [B, H, W, C] and vol_half [B, H/2, W/2, (D-1)*C] is the flat
    gaussian_volume of the pooled frame (D = num_levels + 1).

    The TPU-native replacement for the full-resolution volume: the
    blurred levels 1..D-1 carry no content above the half-res Nyquist
    worth a full-res sample lattice, so they are built AND sampled at /2
    — the warp then blends one full-res level-0 sample with one upsampled
    half-res blurred sample (warp_volume_pyramid). An operator change vs
    compressai gaussian_volume (levels re-centred: pyramid level d >= 1
    ~ stock level d+~0.5), priced by retraining at the tiny golden rung
    (tests/test_rd.py TestGoldenRDSSFTPU)."""
    return x, gaussian_volume(avg_pool2(x), sigma0, num_levels - 1)


def _hat_blend(sampled: jax.Array, z: jax.Array, D: int, C: int) -> jax.Array:
    """Depth hat-weight blend over a flat level stack (slice-sum)."""
    out = None
    for d in range(D):
        wd = jnp.maximum(0.0, 1.0 - jnp.abs(z - d)).astype(sampled.dtype)
        term = wd * sampled[..., d * C:(d + 1) * C]
        out = term if out is None else out + term
    return out


def warp_volume_pyramid(
    level0: jax.Array, vol_half: jax.Array, flow: jax.Array,
    scale_field: jax.Array, num_levels: int,
) -> jax.Array:
    """Trilinear-style sample of the pyramid volume (full-res NHWC form).

    flow: [B, H, W, 2] normalized (as warp_volume); scale_field:
    [B, H, W, 1] in [-1, 1]. Depth z unnormalizes exactly like
    warp_volume; z in [0, 1) lerps the full-res level-0 sample against
    the upsampled half-res blurred sample, z >= 1 blends inside the
    half-res stack."""
    B, H, W, C = level0.shape
    D = num_levels + 1
    flow_px = flow.astype(jnp.float32) * jnp.asarray(
        [W / 2.0, H / 2.0], jnp.float32
    )
    s0 = _pixel_warp_dispatch(
        level0, flow_px, exact=_FORCE_EXACT_WARP,
        r=PALLAS_WARP_MAX_DISPLACEMENT,
    )
    z = jnp.clip(((scale_field + 1.0) * D - 1.0) * 0.5, 0.0, D - 1)
    flow_h = avg_pool2(flow_px) * 0.5
    z_h = jnp.clip(avg_pool2(z), 1.0, D - 1.0) - 1.0
    sampled_h = _pixel_warp_dispatch(
        vol_half, flow_h, exact=_FORCE_EXACT_WARP,
        r=PALLAS_WARP_MAX_DISPLACEMENT // 2,
    )
    th = _hat_blend(sampled_h, z_h, D - 1, C)
    t = bilinear_upsample_x2(th)
    a = jnp.maximum(0.0, 1.0 - z).astype(level0.dtype)
    return a * s0 + (1.0 - a.astype(t.dtype)) * t


def warp_volume_pyramid_s2d(
    level0_s2d: jax.Array, vol_half: jax.Array, motion_s2d: jax.Array,
    num_levels: int,
) -> jax.Array:
    """Pyramid scale-space warp with every tensor in the s2d domain — the
    '-TPU' SSF family's production prediction op (no full-resolution
    thin-channel tensor exists anywhere in it except the kernel's own
    [B, H, W, 2] flow input, which its relayouts consume once).

    level0_s2d: [B, H/2, W/2, 4C] s2d form of the reference frame;
    vol_half: [B, H/2, W/2, (D-1)*C] flat half-res blurred stack;
    motion_s2d: [B, H/2, W/2, 12] motion field in C-MAJOR phase order:
    channels [fx_p0..p3, fy_p0..p3, scale_p0..p3] where p = ry*2 + rx is
    the full-res phase. (The (ry, rx, c)-interleaved d2s order would need
    four 1-2-channel slices here, each a lane-padded [B, H/2, W/2, <=2]
    materialization — 6.5 ms of pure padding writes at 1080p, round-5
    xprof. The decoder's final conv LEARNS whichever order its consumer
    reads, so the pipeline simply defines c-major as its contract; only
    the warp reads it.) Returns the warped prediction in s2d form
    [B, H/2, W/2, 4C]."""
    B, H2, W2, C4 = level0_s2d.shape
    C = C4 // 4
    H, W = 2 * H2, 2 * W2
    D = num_levels + 1
    dt = level0_s2d.dtype
    scl8 = jnp.asarray([W / 2.0] * 4 + [H / 2.0] * 4, jnp.float32)

    # Layout discipline (round-5 xprof lesson): every channel MIX below is
    # a 1x1 matmul (einsum over the lane dim — MXU/VPU native); per-lane
    # slice-reduce / slice-broadcast formulations of the same math made
    # XLA emit lane->spatial transpose loops costing 8-16 ms each at
    # 1080p. Elementwise ops all stay on lane-form [B, H/2, W/2, K]
    # tensors.

    # flow for the level-0 sample, kept in s2d PHASE form end to end
    # (one contiguous 8-channel slice; the kernel pre-tiles phases
    # directly — a full-res [B, H, W, 2] intermediate is a ~4 ms
    # lane-padded relayout at 1080p)
    flow_s2d = motion_s2d[..., :8].astype(jnp.float32) * scl8
    s0 = _pixel_warp_s2d_sflow_dispatch(
        level0_s2d, flow_s2d, exact=_FORCE_EXACT_WARP,
        r=PALLAS_WARP_MAX_DISPLACEMENT,
    )

    # half-res coords: [fx_h, fy_h, s_mean] via one phase-averaging matmul
    mix_m = np.zeros((12, 3), np.float32)
    mix_m[0:4, 0] = 0.25 * (W / 2.0) * 0.5   # fx phases -> half-res px
    mix_m[4:8, 1] = 0.25 * (H / 2.0) * 0.5
    mix_m[8:12, 2] = 0.25                     # scale phases -> mean
    mix = jnp.einsum(
        "bhwc,cd->bhwd", motion_s2d.astype(jnp.float32),
        jnp.asarray(mix_m),
    )
    flow_h = mix[..., 0:2]
    z_h = jnp.clip(((mix[..., 2:3] + 1.0) * D - 1.0) * 0.5, 1.0, D - 1.0) - 1.0

    sampled_h = _pixel_warp_dispatch(
        vol_half, flow_h, exact=_FORCE_EXACT_WARP,
        r=PALLAS_WARP_MAX_DISPLACEMENT // 2,
    )
    # depth hat blend, lane-form: weights [B,H2,W2,D-1] -> replicate per
    # color via kron matmul -> multiply -> sum level groups via matmul
    lv = jnp.arange(D - 1, dtype=z_h.dtype)
    wd = jnp.maximum(0.0, 1.0 - jnp.abs(z_h - lv))          # [B,H2,W2,D-1]
    rep = jnp.asarray(np.kron(np.eye(D - 1), np.ones((1, C))), jnp.float32)
    w_ext = jnp.einsum("bhwd,dc->bhwc", wd, rep).astype(dt)  # [.., (D-1)*C]
    grp = jnp.asarray(np.kron(np.ones((D - 1, 1)), np.eye(C)), dt)
    th = jnp.einsum("bhwc,cd->bhwd", w_ext * sampled_h, grp)  # [.., C]
    t_s2d = up2_to_s2d(th)  # [B, H/2, W/2, 4C], (ry, rx, c) phase order

    # per-phase level-0 weight a = max(0, 1 - z), replicated to (p, c)
    # lanes via kron — matching s0/t_s2d's (ry, rx, c) channel order
    zp = jnp.clip(((motion_s2d[..., 8:12] + 1.0) * D - 1.0) * 0.5, 0.0, D - 1)
    a4 = jnp.maximum(0.0, 1.0 - zp)                          # [B,H2,W2,4]
    rep4 = jnp.asarray(np.kron(np.eye(4), np.ones((1, C))), jnp.float32)
    a12 = jnp.einsum("bhwd,dc->bhwc", a4, rep4).astype(dt)   # [.., 4C]
    return a12 * s0 + (jnp.asarray(1.0, dt) - a12) * t_s2d
