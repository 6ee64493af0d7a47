"""SPyNet coarse-to-fine optical flow (flax.linen, NHWC).

Reference ME_Spynet (models.py:857-887; pretrained variant
DVC/subnet/endecoder.py:312-356): a 4-level avg-pool pyramid, each level
refining a 2x-upsampled (and x2-scaled) flow with a 5-conv MEBasic block fed
[target_level, warp(ref_level, up_flow), up_flow].

`spynet(im_target, im_ref)` returns flow such that
`flow_warp(im_ref, flow) ~= im_target` (the reference calls it as
`opticFlow(Y1_raw, Y0_com)` and warps Y0_com, models.py:991, 1005).

Pretrained weights: the reference ships 60 .npy conv tensors
(DVC/flow_pretrain_np, torch OIHW layout); `load_pretrained_spynet`
converts them into this module's param pytree (HWIO).
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from fastvideocodec_tpu.layers.blocks import MEBasic
from fastvideocodec_tpu.ops.warp import (
    avg_pool2,
    bilinear_upsample_x2,
    depth_to_space,
    flow_warp,
    space_to_depth,
)


class SpyNet(nn.Module):
    levels: int = 4
    widths: tuple = (32, 64, 32, 16)  # MEBasic conv widths
    kernel: int = 7                   # MEBasic kernel size (all levels), or
    kernels: tuple = ()               # per-level sizes, coarsest first —
    # fine levels refine by ~±1px so the TPU configs shrink their kernels
    s2d_levels: int = 0               # TPU-native (no reference counterpart):
    # the finest N levels run their MEBasic tower in the space-to-depth
    # domain — the conv sees the identical full-res content as 4x channels
    # at 1/4 the spatial positions (s2d is a permutation, no information
    # loss) and emits full-res flow through a polyphase 8-channel output +
    # depth-to-space. Chip-measured 2.7x faster at [15,512,1024]: the
    # narrow-channel full-res towers are spatially bound, not MAC-bound
    # (widths x8 cost only +25%), so quartering positions ~quarters time;
    # the receptive field in source pixels doubles as a side effect.
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, im1, im2):
        """im1: target frame; im2: reference frame; both [B, H, W, 3].

        Returns flow [B, H, W, 2] (x, y pixel displacements) mapping im2
        onto im1.
        """
        L = self.levels
        im1s, im2s = [im1], [im2]
        for _ in range(L - 1):
            im1s.append(avg_pool2(im1s[-1]))
            im2s.append(avg_pool2(im2s[-1]))

        B, Hc, Wc, _ = im2s[-1].shape
        flow = jnp.zeros((B, Hc // 2, Wc // 2, 2), dtype=im1.dtype)
        for lvl in range(L):
            up = bilinear_upsample_x2(flow) * 2.0
            tgt = im1s[L - 1 - lvl]
            ref = im2s[L - 1 - lvl]
            inp = jnp.concatenate([tgt, flow_warp(ref, up), up], axis=-1)
            k = self.kernels[lvl] if self.kernels else self.kernel
            if lvl >= L - self.s2d_levels:
                # s2d-domain tower: same inputs as 4x channels at 1/4 the
                # positions; polyphase 2x2x2 output depth-to-spaces back to
                # a full-res refinement
                ref8 = space_to_depth(inp, 2)
                r = MEBasic(
                    widths=self.widths, kernel=k, out_channels=8,
                    dtype=self.dtype, name=f"level{lvl + 1}",
                )(ref8)
                flow = up + depth_to_space(r, 2)
            else:
                flow = up + MEBasic(
                    widths=self.widths, kernel=k,
                    dtype=self.dtype, name=f"level{lvl + 1}",
                )(inp)
        return flow


DEFAULT_WEIGHTS = os.path.join(os.path.dirname(__file__), "..", "assets", "spynet.npz")


def load_pretrained_spynet(params: dict, npz_path: str | None = None) -> dict:
    """Replace a SpyNet param pytree's weights with the pretrained ones.

    The npz maps 'L{level}_F{conv}_{weight,bias}' (level 1..4, conv 1..5)
    to torch-layout arrays (weights OIHW). Returns a new pytree.
    """
    path = npz_path or DEFAULT_WEIGHTS
    data = np.load(path)
    new = dict(params)
    conv_names = ["Conv_0", "Conv_1", "Conv_2", "Conv_3", "Conv_4"]
    for lvl in range(1, 5):
        block = dict(new[f"level{lvl}"])
        for ci, cname in enumerate(conv_names, start=1):
            w = data[f"L{lvl}_F{ci}_weight"]  # [O, I, kh, kw]
            b = data[f"L{lvl}_F{ci}_bias"]
            entry = dict(block[cname])
            entry["kernel"] = jnp.asarray(np.transpose(w, (2, 3, 1, 0)))  # HWIO
            entry["bias"] = jnp.asarray(b)
            block[cname] = entry
        new[f"level{lvl}"] = block
    return new


def convert_reference_npy_dir(src_dir: str, out_path: str | None = None) -> str:
    """One-time converter: pack the reference's flow_pretrain_np/*.npy files
    (DVC/subnet/endecoder.py:122-139 naming: modelL{l}_F-{c}-{weight,bias})
    into a single npz asset."""
    out_path = out_path or DEFAULT_WEIGHTS
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    packed = {}
    for lvl in range(1, 5):
        for conv in range(1, 6):
            for kind in ("weight", "bias"):
                f = os.path.join(src_dir, f"modelL{lvl}_F-{conv}-{kind}.npy")
                packed[f"L{lvl}_F{conv}_{kind}"] = np.load(f)
    np.savez_compressed(out_path, **packed)
    return out_path
