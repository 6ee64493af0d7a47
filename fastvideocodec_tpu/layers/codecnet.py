"""Config-list-driven conv-stack builder (the reference's `CodecNet`,
models.py:1492-1546).

A config is a tuple whose entries are either

- an int — a parameter-free op code, or
- a 5-tuple ``(type, kernel, stride, ch_in, ch_out)`` — a layer.

Type codes (reference models.py:1503-1533; NHWC here):

====  =============================================================
0     conv ``k x k`` stride ``s`` (padding k//2)
1     transposed conv (stride-2 runs the polyphase dense form)
2     ReLU
3     LeakyReLU(0.1)
4     GDN (commented out in the reference builder; live here)
5     inverse GDN (same)
7     Tanh
8     strided basic residual block (conv-s + conv, projected shortcut)
10    average pool ``k x k`` stride ``s``
11    conv attention block (reference AttentionBlock)
13    residual block (stride 1)
====  =============================================================

``ch_in`` is implicit in NHWC convs; it stays in the config for parity
with the reference's signatures (and is asserted at trace time). Codes
6 (BatchNorm), 9 (View) and 12 (AttentionLayer) are unused by every
shipped reference config and unsupported here — the builder raises.

Convs/deconvs use the reference's init: Xavier-normal with gain sqrt(2)
and bias 0.01 (models.py:1539-1543).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from fastvideocodec_tpu.layers.blocks import ConvAttention, ResBlock
from fastvideocodec_tpu.layers.transforms import PolyphaseDeconv
from fastvideocodec_tpu.ops.gdn import GDN

# xavier_normal_(gain=sqrt(2)): std = sqrt(2) * sqrt(2/(fan_in+fan_out))
#                                   = sqrt(2 / fan_avg)
_XAVIER_G2 = nn.initializers.variance_scaling(2.0, "fan_avg", "normal")
_BIAS_001 = nn.initializers.constant(0.01)


class _StridedBasicBlock(nn.Module):
    """Code 8: resnet-style basic block with stride (reference BasicBlock)."""

    out_channels: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = self.stride
        h = nn.Conv(self.out_channels, (3, 3), strides=(s, s), padding=1,
                    dtype=self.dtype)(x)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype)(
            jax.nn.relu(h)
        )
        if s != 1 or x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), strides=(s, s),
                        dtype=self.dtype)(x)
        return jax.nn.relu(x + h)


class CodecNet(nn.Module):
    """Sequential stack built from a static config tuple (see module doc)."""

    cfgs: tuple
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        for i, cfg in enumerate(self.cfgs):
            if isinstance(cfg, int):
                code, k, s, ch1, ch2 = cfg, None, None, None, x.shape[-1]
            else:
                code, k, s, ch1, ch2 = cfg
                assert x.shape[-1] == ch1, (
                    f"cfg[{i}] expects {ch1} input channels, got {x.shape[-1]}"
                )
            if code == 0:
                x = nn.Conv(
                    ch2, (k, k), strides=(s, s), padding=k // 2, dtype=dt,
                    kernel_init=_XAVIER_G2, bias_init=_BIAS_001,
                    name=f"conv_{i}",
                )(x)
            elif code == 1:
                if s == 2:
                    x = PolyphaseDeconv(
                        ch2, kernel_size=k, dtype=dt, name=f"deconv_{i}"
                    )(x)
                else:
                    x = nn.ConvTranspose(
                        ch2, (k, k), strides=(s, s), padding="SAME", dtype=dt,
                        kernel_init=_XAVIER_G2, bias_init=_BIAS_001,
                        name=f"deconv_{i}",
                    )(x)
            elif code == 2:
                x = jax.nn.relu(x)
            elif code == 3:
                x = jax.nn.leaky_relu(x, 0.1)
            elif code == 4:
                x = GDN(ch2, dtype=dt, name=f"gdn_{i}")(x)
            elif code == 5:
                x = GDN(ch2, inverse=True, dtype=dt, name=f"igdn_{i}")(x)
            elif code == 7:
                x = jnp.tanh(x)
            elif code == 8:
                x = _StridedBasicBlock(ch2, stride=s, dtype=dt,
                                       name=f"basic_{i}")(x)
            elif code == 10:
                x = nn.avg_pool(x, (k, k), strides=(s, s))
            elif code == 11:
                assert ch1 == ch2
                x = ConvAttention(dim=ch2, dtype=dt, name=f"attn_{i}")(x)
            elif code == 13:
                x = ResBlock(ch2, dtype=dt, name=f"res_{i}")(x)
            else:
                raise ValueError(f"conv type {code} not supported (cfg[{i}])")
        return x


def er_gen_config(channels: int, hidden: int, kernel: int = 5,
                  act: int = 3) -> tuple:
    """The Base-ER error-restoration stack config (reference
    models.py:1587-1589): 4 stride-1 convs channels->hidden->hidden->
    hidden->channels, each followed by the activation code (the reference
    default act code 4/GDN is commented out of its own builder, so its
    runnable configuration is LeakyReLU=3)."""
    k = kernel
    return (
        (0, k, 1, channels, hidden), act,
        (0, k, 1, hidden, hidden), act,
        (0, k, 1, hidden, hidden), act,
        (0, k, 1, hidden, channels), act,
    )
