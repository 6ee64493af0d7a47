"""Analysis/synthesis transforms (flax.linen, NHWC).

DVC-family transforms (reference DVC/subnet/{analysis,synthesis,analysis_mv,
synthesis_mv,analysis_prior,synthesis_prior}.py) and SSF-family conv stacks
(reference models.py:1877-1957 Encoder/Decoder/HyperEncoder/HyperDecoder/
FlowPredictor). Channel constants mirror DVC/subnet/basics.py:23-27.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from fastvideocodec_tpu.layers.blocks import SpaceTimeAttention, qrelu
from fastvideocodec_tpu.ops.gdn import GDN

OUT_CHANNEL_N = 64
OUT_CHANNEL_M = 96
OUT_CHANNEL_MV = 128


def _conv(feats, k, s, dtype):
    return nn.Conv(feats, (k, k), strides=(s, s), padding=k // 2, dtype=dtype)


def _polyphase_taps(k: int, stride: int):
    """Tap layout of a transposed conv in the reference's torch geometry
    (ConvTranspose2d(k, stride, padding=k//2, output_padding=stride-1) —
    the convention every deconv in the reference uses), per output phase.

    A transposed conv = conv of the stride-dilated input with padding
    pad_a = k-1-padding on the left; y[o] = sum_q w_flip[q] * xd[o + q -
    pad_a] with xd[s*m] = x[m] and w_flip the spatially flipped kernel
    (torch conv_transpose correlates un-flipped in transposed indexing).
    For output phase r (o = s*i + r) only taps with (r + q - pad_a) % s == 0
    contribute, at input offset d = (r + q - pad_a) // s. Returns
    (taps[r] -> list of (d, q_flipped), dmin, dmax); q indexes the
    UN-flipped kernel so imported torch weights drop in directly."""
    pad_a = k - 1 - k // 2
    taps = {
        r: [((r + q - pad_a) // stride, k - 1 - q) for q in range(k)
            if (r + q - pad_a) % stride == 0]
        for r in range(stride)
    }
    ds = [d for t in taps.values() for d, _ in t]
    return taps, min(ds), max(ds)


class PolyphaseDeconv(nn.Module):
    """Stride-2 transposed conv computed polyphase: one dense stride-1 conv
    producing s*s*Cout channels + a depth-to-space interleave.

    Mathematically identical to nn.ConvTranspose(SAME) with the same
    (k, k, Cin, Cout) 'kernel' param (modulo fp summation order), but the
    MXU never multiplies the zeros of the stride-dilated input: on a v5e
    the dilated lowering wastes ~(s*s-1)/(s*s) of its MACs, and the dense
    form also quadruples the output-channel dimension (better MXU lane
    utilization at the reference's 64/96-channel widths).

    `act`: optional elementwise activation applied to bias + conv output
    BEFORE the depth-to-space permutation — the same values in a different
    order, so act(d2s(y)) == d2s(act(y)) element-for-element, but applied
    pre-shuffle XLA fuses it into the conv epilogue instead of running a
    separate full-tensor pass after the layout copies (measured ~6 ms on
    the mv_decoder's widest stage at 1080p GOP16)."""

    features: int
    kernel_size: int = 5
    stride: int = 2
    act: object = None  # elementwise activation fn or None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k, s = self.kernel_size, self.stride
        cin = x.shape[-1]
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, k, cin, self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        w = w.astype(self.dtype)
        x = x.astype(self.dtype)  # match nn.ConvTranspose's input promotion
        taps, dmin, dmax = _polyphase_taps(k, s)
        L = dmax - dmin + 1
        kern = jnp.zeros((L, L, cin, s, s, self.features), self.dtype)
        for ry in range(s):
            for dy, qy in taps[ry]:
                for rx in range(s):
                    for dx, qx in taps[rx]:
                        kern = kern.at[dy - dmin, dx - dmin, :, ry, rx, :].set(
                            w[qy, qx]
                        )
        kern = kern.reshape(L, L, cin, s * s * self.features)
        y = jax.lax.conv_general_dilated(
            x, kern, (1, 1),
            padding=((-dmin, dmax), (-dmin, dmax)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        # bias + activation pre-d2s: channel block layout is (sy, sx, f), so
        # the per-feature bias tiles s*s times along the fused channel axis
        y = y + jnp.tile(bias.astype(self.dtype), s * s)
        if self.act is not None:
            y = self.act(y)
        B, H, W = y.shape[:3]
        y = y.reshape(B, H, W, s, s, self.features)
        return y.transpose(0, 1, 3, 2, 4, 5).reshape(B, H * s, W * s, self.features)


def _deconv(feats, k, s, dtype, act=None):
    # torch ConvTranspose2d(k, s, padding=k//2, output_padding=s-1) doubles
    # spatial dims for s=2; the polyphase form computes the identical map
    # without the stride-dilated input (see PolyphaseDeconv). `act` fuses
    # an elementwise activation pre-d2s (identical values; see above).
    if s == 2:
        return PolyphaseDeconv(feats, kernel_size=k, act=act, dtype=dtype)
    mod = nn.ConvTranspose(feats, (k, k), strides=(s, s), padding="SAME", dtype=dtype)
    if act is None:
        return mod
    return nn.Sequential([mod, act])


def leaky01(x):
    return jax.nn.leaky_relu(x, negative_slope=0.1)


class AnalysisNet(nn.Module):
    """Residual analysis: `stages`x (5x5 s2 conv + GDN, no GDN on the last)
    (DVC/subnet/analysis.py:10-61; reference stages=4). The TPU s2d configs
    use stages=3 so the latent sits at the same /16 of FULL resolution."""

    conv_channels: int = OUT_CHANNEL_N
    out_channels: int = OUT_CHANNEL_M
    stages: int = 4
    use_attn: bool = False
    attn_depth: int = 12
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.conv_channels
        for _ in range(self.stages - 1):
            x = GDN(c, dtype=self.dtype)(_conv(c, 5, 2, self.dtype)(x))
        x = _conv(self.out_channels, 5, 2, self.dtype)(x)
        if self.use_attn:
            x = SpaceTimeAttention(
                self.out_channels, depth=self.attn_depth, dtype=self.dtype
            )(x)
        return x


class SynthesisNet(nn.Module):
    """Residual synthesis: 4x (5x5 s2 deconv + IGDN) (DVC/subnet/synthesis.py:8-60)."""

    conv_channels: int = OUT_CHANNEL_N
    out_channels: int = 3
    stages: int = 4
    use_attn: bool = False
    attn_depth: int = 12
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.use_attn:
            x = SpaceTimeAttention(x.shape[-1], depth=self.attn_depth, dtype=self.dtype)(x)
        c = self.conv_channels
        for _ in range(self.stages - 1):
            x = GDN(c, inverse=True, dtype=self.dtype)(_deconv(c, 5, 2, self.dtype)(x))
        return _deconv(self.out_channels, 5, 2, self.dtype)(x)


class AnalysisMVNet(nn.Module):
    """Motion analysis: 8 3x3 convs, 4 strided, LeakyReLU(0.1)
    (DVC/subnet/analysis_mv.py:8-80)."""

    conv_channels: int = OUT_CHANNEL_MV
    out_channels: int = OUT_CHANNEL_MV
    stages: int = 4  # number of stride-2 convs among the 8 layers
    use_attn: bool = False
    attn_depth: int = 12
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.conv_channels
        strides = [2, 1] * (self.stages - 1) + [2]
        for stride in strides:
            x = leaky01(_conv(c, 3, stride, self.dtype)(x))
        x = _conv(self.out_channels, 3, 1, self.dtype)(x)
        if self.use_attn:
            x = SpaceTimeAttention(
                self.out_channels, depth=self.attn_depth, dtype=self.dtype
            )(x)
        return x


class SynthesisMVNet(nn.Module):
    """Motion synthesis: mirrored 8-layer stack (DVC/subnet/synthesis_mv.py:9-81).

    `polyphase_out` (TPU-native option, no reference counterpart): the
    last spatial doubling is folded into the output conv — the stack stops
    one level down and the final conv emits 2x2x`out_channels` channels
    that depth-to-space to full resolution. Full-res expressiveness is
    preserved (d2s is a permutation of the conv's output channels, exactly
    the PolyphaseDeconv construction); what changes is that the 128-wide
    trunk convs never run at full resolution, where they are
    bandwidth-bound, not MAC-bound (chip-measured ~5 TF/s for the final
    full-res layers vs ~150 at the lower level)."""

    conv_channels: int = OUT_CHANNEL_MV
    out_channels: int = 2
    stages: int = 4  # number of stride-2 deconvs among the 8 layers
    use_attn: bool = False
    attn_depth: int = 12
    polyphase_out: bool = False
    polyphase_factor: int = 2  # output upsampling folded into the final
    # conv when polyphase_out: 2 = replace the last deconv; 4 = ALSO lift
    # the output one level above the trunk's native resolution (the
    # '-F2' full-res-flow decoder: an s2d-domain stages=3 trunk emits a
    # full-resolution field without any full-res conv)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.use_attn:
            x = SpaceTimeAttention(x.shape[-1], depth=self.attn_depth, dtype=self.dtype)(x)
        c = self.conv_channels
        ups = [True, False] * (self.stages - 1) + [True]
        if self.polyphase_out:
            for up in ups[:-1]:
                if up:
                    x = _deconv(c, 3, 2, self.dtype, act=leaky01)(x)
                else:
                    x = leaky01(_conv(c, 3, 1, self.dtype)(x))
            f = self.polyphase_factor
            y = _conv(f * f * self.out_channels, 3, 1, self.dtype)(x)
            B, H, W = y.shape[:3]
            y = y.reshape(B, H, W, f, f, self.out_channels)
            return y.transpose(0, 1, 3, 2, 4, 5).reshape(
                B, H * f, W * f, self.out_channels
            )
        for up in ups:
            if up:
                x = _deconv(c, 3, 2, self.dtype, act=leaky01)(x)
            else:
                x = leaky01(_conv(c, 3, 1, self.dtype)(x))
        return _conv(self.out_channels, 3, 1, self.dtype)(x)


class AnalysisPriorNet(nn.Module):
    """Hyper analysis: abs -> conv3 s1 -> conv5 s2 -> conv5 s2
    (DVC/subnet/analysis_prior.py:10-58)."""

    conv_channels: int = OUT_CHANNEL_N
    use_attn: bool = False
    attn_depth: int = 12
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.conv_channels
        x = jnp.abs(x)
        x = jax.nn.relu(_conv(c, 3, 1, self.dtype)(x))
        if self.use_attn:
            x = SpaceTimeAttention(c, depth=self.attn_depth, dtype=self.dtype)(x)
        x = jax.nn.relu(_conv(c, 5, 2, self.dtype)(x))
        return _conv(c, 5, 2, self.dtype)(x)


class SynthesisPriorNet(nn.Module):
    """Hyper synthesis producing sigma = exp(out)
    (DVC/subnet/synthesis_prior.py:11-62)."""

    conv_channels: int = OUT_CHANNEL_N
    out_channels: int = OUT_CHANNEL_M
    use_attn: bool = False
    attn_depth: int = 12
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.conv_channels
        x = _deconv(c, 5, 2, self.dtype, act=jax.nn.relu)(x)
        if self.use_attn:
            x = SpaceTimeAttention(c, depth=self.attn_depth, dtype=self.dtype)(x)
        x = _deconv(c, 5, 2, self.dtype, act=jax.nn.relu)(x)
        x = _conv(self.out_channels, 3, 1, self.dtype)(x)
        return jnp.exp(x)


# ---------------------------------------------------------------------------
# SSF-family conv stacks (reference models.py:1877-1957)
# ---------------------------------------------------------------------------


class SSFEncoder(nn.Module):
    """4x (5x5 s2 conv + ReLU except last) (models.py:1877-1889).

    ``s2d=2`` (TPU-native, no reference counterpart): the input folds into
    the space-to-depth domain first ([H/2, W/2, 4C] — 4x the input
    channels for the MXU's contraction) and one stride-2 stage drops, so
    the latent stays at /16 of full resolution while the two most
    expensive conv levels (full- and half-resolution, where 128-wide
    tensors are HBM-bound) never exist. Same playbook that took LSVC-TPU
    from 5.6 to 85 fps (models/lsvc.py docstring)."""

    mid_planes: int = 128
    out_planes: int = 192
    s2d: int = 1
    # pipeline-s2d mode: the caller already carries the frame in s2d form
    # (4x the channels at /2 res), so the internal fold is skipped — the
    # conv weight shapes are identical either way (only the channel
    # ORDER differs: phase-blocked cat(s2d(a), s2d(b)) vs s2d(cat(a, b))
    # interleaving; a fresh training run absorbs the permutation)
    input_s2d: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from fastvideocodec_tpu.ops.warp import space_to_depth

        m = self.mid_planes
        if self.s2d > 1:
            if not self.input_s2d:
                x = space_to_depth(x, self.s2d)
            x = jax.nn.relu(_conv(m, 5, 2, self.dtype)(x))
            x = jax.nn.relu(_conv(m, 5, 2, self.dtype)(x))
            return _conv(self.out_planes, 5, 2, self.dtype)(x)
        x = jax.nn.relu(_conv(m, 5, 2, self.dtype)(x))
        x = jax.nn.relu(_conv(m, 5, 2, self.dtype)(x))
        x = jax.nn.relu(_conv(m, 5, 2, self.dtype)(x))
        return _conv(self.out_planes, 5, 2, self.dtype)(x)


class SSFDecoder(nn.Module):
    """4x (5x5 s2 deconv + ReLU except last) (models.py:1890-1902).

    ``s2d=2`` (TPU-native): two deconv stages lift the /16 latent to /4 of
    full resolution, a third deconv emits ``4*out_planes`` channels at /2,
    and a final depth-to-space lands full resolution — the LSVC-TPU
    synthesis pattern (models/lsvc.py res_decoder + d2s). The 128-wide
    trunk never runs above /4 res and nothing wider than ``4*out_planes``
    ever exists above it. (A first cut that stopped the deconvs at /4 and
    emitted a factor-4 polyphase output measured +171% BD-rate at the
    tiny rung — one real /2 deconv level is where the RD lives.)"""

    mid_planes: int = 128
    out_planes: int = 3
    s2d: int = 1
    # pipeline-s2d mode: return the pre-d2s tensor [H/2, W/2, f*f*out]
    # (phase channel order (ry, rx, c)) — the caller stays in the s2d
    # domain; weight shapes are unchanged
    output_s2d: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from fastvideocodec_tpu.ops.warp import depth_to_space

        m = self.mid_planes
        if self.s2d > 1:
            x = _deconv(m, 5, 2, self.dtype, act=jax.nn.relu)(x)
            x = _deconv(m, 5, 2, self.dtype, act=jax.nn.relu)(x)
            f = self.s2d
            # a real (if narrow) feature level at /2 before the polyphase
            # output: emitting out-planes straight from the /4 trunk
            # measured +72.6% BD-rate at the tiny rung (capacity at /2 is
            # where SSF's decoders earn their rate)
            x = _deconv(4 * m // 8, 5, 2, self.dtype, act=jax.nn.relu)(x)
            y = _conv(f * f * self.out_planes, 3, 1, self.dtype)(x)
            if self.output_s2d:
                return y
            return depth_to_space(y, f)
        x = _deconv(m, 5, 2, self.dtype, act=jax.nn.relu)(x)
        x = _deconv(m, 5, 2, self.dtype, act=jax.nn.relu)(x)
        x = _deconv(m, 5, 2, self.dtype, act=jax.nn.relu)(x)
        return _deconv(self.out_planes, 5, 2, self.dtype)(x)


class SSFHyperEncoder(nn.Module):
    """3x (5x5 s2 conv, ReLU between) (models.py:1916-1926)."""

    mid_planes: int = 192
    out_planes: int = 192
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        m = self.mid_planes
        x = jax.nn.relu(_conv(m, 5, 2, self.dtype)(x))
        x = jax.nn.relu(_conv(m, 5, 2, self.dtype)(x))
        return _conv(self.out_planes, 5, 2, self.dtype)(x)


class SSFHyperDecoder(nn.Module):
    """3x (5x5 s2 deconv, ReLU between) (models.py:1927-1937)."""

    mid_planes: int = 192
    out_planes: int = 192
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        m = self.mid_planes
        x = _deconv(m, 5, 2, self.dtype, act=jax.nn.relu)(x)
        x = _deconv(m, 5, 2, self.dtype, act=jax.nn.relu)(x)
        return _deconv(self.out_planes, 5, 2, self.dtype)(x)


class SSFHyperDecoderQReLU(nn.Module):
    """HyperDecoder with QReLU activations (models.py:1938-1957)."""

    mid_planes: int = 192
    out_planes: int = 192
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        m = self.mid_planes
        x = _deconv(m, 5, 2, self.dtype, act=qrelu)(x)
        x = _deconv(m, 5, 2, self.dtype, act=qrelu)(x)
        return _deconv(self.out_planes, 5, 2, self.dtype, act=qrelu)(x)


class FlowPredictor(nn.Module):
    """4x (5x5 s1 conv + ReLU except last) predicting motion_info from
    (x_ref, x_ref_ref, motion_prior) (models.py:1903-1915, 2001).

    ``s2d=2`` (TPU-native): the reference runs this 128-wide stride-1
    stack at FULL resolution — at 1080p that is ~0.5 GB of activations
    per conv pass, the single hottest op in the Vesper encode path. The
    s2d variant folds the 9-channel input into 36 channels at half
    resolution (4x fewer MACs AND 4x less HBM traffic per mid conv) and
    emits the full-resolution motion field through a polyphase output
    conv (d2s of 4*out channels — full-res expressiveness preserved)."""

    mid_planes: int = 128
    out_planes: int = 3
    s2d: int = 1
    # pipeline-s2d mode (see SSFEncoder/SSFDecoder): consume the already
    # s2d-folded context and emit the pre-d2s motion field
    input_s2d: bool = False
    output_s2d: bool = False
    # quarter-res trunk: fold ONCE MORE inside, run the stride-1 trunk at
    # /4 of full res (4x fewer MACs — the /2 trunk's three 128-wide 5x5
    # convs cost ~13 ms/frame at 1080p, the whole ELFVC-TPU speed gap vs
    # target), and emit the /2 motion field through a polyphase output
    # conv. RD priced at the tiny golden rung like every '-TPU' operator
    # change.
    quarter_trunk: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from fastvideocodec_tpu.ops.warp import depth_to_space, space_to_depth

        m = self.mid_planes
        if self.s2d > 1:
            if not self.input_s2d:
                x = space_to_depth(x, self.s2d)
            f = self.s2d
            if self.quarter_trunk:
                # stride-2 stem (a strided conv beats an explicit s2d
                # fold: no relayout pass) -> /4-res trunk -> polyphase
                # output back to the /2 motion grid
                x = jax.nn.relu(_conv(m, 5, 2, self.dtype)(x))
                x = jax.nn.relu(_conv(m, 5, 1, self.dtype)(x))
                x = jax.nn.relu(_conv(m, 5, 1, self.dtype)(x))
                y = _conv(4 * f * f * self.out_planes, 5, 1, self.dtype)(x)
                y = depth_to_space(y, 2)  # -> [H/2, W/2, f*f*out]
            else:
                x = jax.nn.relu(_conv(m, 5, 1, self.dtype)(x))
                x = jax.nn.relu(_conv(m, 5, 1, self.dtype)(x))
                x = jax.nn.relu(_conv(m, 5, 1, self.dtype)(x))
                y = _conv(f * f * self.out_planes, 5, 1, self.dtype)(x)
            if self.output_s2d:
                return y
            return depth_to_space(y, f)
        x = jax.nn.relu(_conv(m, 5, 1, self.dtype)(x))
        x = jax.nn.relu(_conv(m, 5, 1, self.dtype)(x))
        x = jax.nn.relu(_conv(m, 5, 1, self.dtype)(x))
        return _conv(self.out_planes, 5, 1, self.dtype)(x)
