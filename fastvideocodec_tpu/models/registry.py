"""Codec registry: typed configs + a compatibility parser for the
reference's name-string encoding (SURVEY.md §5 'Config / flag system').

The reference encodes model variants in the codec name ('-A' attention,
'-128' channels, '-L'/'-O'/'-D' graph shape, '-EC'/'-ER', '-SP', 'MCVC-IA',
'MCVC-IA-OLFT' — models.py:1161-1166, 1553-1554, 2002, 2255) and keys the
RD operating point by compression_level into hardcoded lambda / BPG tables
(models.py:68-86). `get_codec_model(name, ...)` accepts the same names.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp

from fastvideocodec_tpu.models.base import Base
from fastvideocodec_tpu.models.dvc import DVC
from fastvideocodec_tpu.models.elfvc import ELFVC
from fastvideocodec_tpu.models.lsvc import LSVC
from fastvideocodec_tpu.models.mcvc import MCVC
from fastvideocodec_tpu.models.rlvc import RLVC
from fastvideocodec_tpu.models.ssf import ScaleSpaceFlow

# reference models.py:72-76
PSNR_LAMBDAS = [256, 512, 1024, 2048, 4096, 8192, 16384, 16384 * 2, 16384 * 4]
MSSSIM_LAMBDAS = [8, 16, 32, 64]
I_LEVELS = [37, 32, 27, 22, 17, 12, 7, 2, 1]


@dataclass
class CodecSpec:
    """A constructed codec module plus its training/eval operating point."""

    name: str
    family: str  # 'dvc' | 'rlvc' | 'lsvc' | 'base' | 'ssf' | 'elfvc' | 'mcvc'
    module: object
    loss_type: str = "P"
    compression_level: int = 2
    extras: dict = field(default_factory=dict)

    @property
    def r(self) -> float:
        table = PSNR_LAMBDAS if self.loss_type == "P" else MSSSIM_LAMBDAS
        return float(table[self.compression_level])

    @property
    def I_level(self) -> int:
        return I_LEVELS[self.compression_level]


def get_codec_model(
    name: str,
    loss_type: str = "P",
    compression_level: int = 2,
    num_views: int = 0,
    resilience: int = 0,
    use_attn: bool = True,
    sp_stage: int = 1,
    dtype=jnp.float32,
) -> CodecSpec:
    """Name-compatible factory (reference get_codec_model, models.py:32-66)."""
    extras: dict = {}
    if name in ("RLVC", "DVC"):  # reference keyword 'RLVC' -> RecProbModel
        if name == "DVC":
            module = DVC(dtype=dtype)
            family = "dvc"
        else:
            module = RLVC(entropy_type="rpm", dtype=dtype)
            family = "rlvc"
    elif name == "DVC-TINY":
        # miniature DVC for golden-RD tests (this framework's own; ships
        # trained weights in assets/)
        module = DVC(
            channels_n=32,
            channels_m=48,
            channels_mv=32,
            spynet_widths=(8, 16, 8, 4),
            spynet_kernel=5,
            warp_width=16,
            dtype=dtype,
        )
        family = "dvc"
    elif name.startswith("RLVC") and "-TINY" in name:
        # miniature recurrent config for golden-RD tests (this framework's
        # own; ships trained weights in assets/) — exercises the
        # RecProbModel/RPM entropy path no hyperprior family covers
        if name.startswith("RLVC-HP"):
            ent = "mshyper"
        elif name.startswith("RLVC2"):
            ent = "rpm2"
        else:
            ent = "rpm"
        module = RLVC(
            channels=32,
            entropy_type=ent,
            spynet_widths=(8, 16, 8, 4),
            spynet_kernel=5,
            warp_width=16,
            dtype=dtype,
        )
        family = "rlvc"
    elif name == "RLVC2":
        module = RLVC(entropy_type="rpm2", dtype=dtype)
        family = "rlvc"
    elif name == "RLVC-HP":
        # RLVC skeleton with the non-recurrent MeanScaleHyperPriors entropy
        # model (reference entropy_models.py:150-324) in both Coder2Ds —
        # the hyperprior path of the RLVC era; real coding keeps the
        # reference's entropy_trick batching semantics (one host-coder
        # call per latent tensor)
        module = RLVC(entropy_type="mshyper", dtype=dtype)
        family = "rlvc"
    elif name == "DVC-pretrained":
        module = DVC(dtype=dtype)
        family = "dvc"
    elif name.startswith("LSVC"):
        graph = "chain" if "-L" in name else ("onehop" if "-O" in name else "tree")
        if "-TINY" in name:
            # miniature configs for golden-RD tests and fast experiments
            # (this framework's own; ship trained weights in assets/).
            # LSVC-TPU-TINY exercises the flagship's TPU-native
            # architecture (s2d codec domain, s2d WarpNet, polyphase mv
            # output) at golden-RD scale.
            tpu = "-TPU" in name
            rigid = "-RW" in name      # round-3 rigid s2d-warp ablation
            halfres = "-HF" in name    # upsampled half-res-flow ablation
            module = LSVC(
                channels=48,
                conv_channels=32,
                s2d=2 if tpu else 1,
                spynet_widths=(8, 16, 8, 4),
                spynet_kernel=5,
                spynet_s2d_levels=2 if tpu else 0,
                mv_polyphase_out=tpu,
                warp_width=32 if tpu else 16,
                mc_displacement=28 if tpu else 0,
                # flagship default = full-res warp + decoder-native
                # full-res flow (the round-4 RD winner); '-RW'/'-HF'
                # select the ablation rungs (semantics uniform across
                # scales; all no-ops when s2d==1)
                full_res_warp=tpu and not rigid,
                mv_full_res_out=tpu and not (rigid or halfres),
                graph=graph,
                dtype=dtype,
            )
        elif "-TPU" in name:
            # TPU-native flagship (this framework's own variant, no
            # reference counterpart): space-to-depth codec domain,
            # pooled-RGB SpyNet with 5x5 kernels, 128-wide transforms,
            # bounded MC displacement (56 full-res px, the Pallas halo
            # radius), s2d-domain U-net MC refinement.
            #
            # Default warp semantics (round-4 RD winner, +6.1% BD-rate vs
            # LSVC-128 at the 128px rung — assets/TINY_RD.md): the MC warp
            # runs at FULL resolution with a flow field the mv decoder
            # emits natively at full res (polyphase_factor=4). Ablation
            # opt-outs price each term of the round-3 gap:
            #   '-HF' — flow bilinearly upsampled from half res (+10.8%)
            #   '-RW' — rigid s2d-domain 2x2-block warp, the round-3
            #           default (+26.1%, the fastest decode)
            # '-F'/'-F2' are accepted as aliases of the default (the
            # round-4 ablation names the trained hd assets).
            rigid = "-RW" in name
            halfres = "-HF" in name
            # '-WT': MC refinement = WarpNetTPU with a stride-2 stem and a
            # 128-wide trunk at /2 of the s2d domain (/4 of full res)
            # instead of the reference-shape U-net — ~3x cheaper
            # refinement; RD priced at the hd rung (assets/TINY_RD.md):
            # REJECTED as default at +23.4% BD-rate.
            wt = "-WT" in name
            # decode-headroom middle grounds between the U-net (52 fps
            # r4 decode) and '-WT' (VERDICT r4 item 5):
            #   '-HU' — half-width (32) reference-shape U-net
            #   '-QU' — full-width U-net one resolution down (pooled
            #           input, upsampled correction, full-res residual)
            hu = "-HU" in name
            qu = "-QU" in name
            module = LSVC(
                channels=128,
                conv_channels=128,
                s2d=2,
                spynet_widths=(32, 64, 32, 16),
                spynet_kernels=(5, 5, 3, 3),
                spynet_s2d_levels=2,
                mv_polyphase_out=True,
                warp_tpu=wt,
                warp_stride=2,
                warp_width=128 if wt else (32 if hu else 64),
                warp_pooled=qu,
                mc_displacement=28,
                full_res_warp=not rigid,
                mv_full_res_out=not (rigid or halfres),
                use_attn="-A" in name,
                use_syn_attn="-S" in name,
                graph=graph,
                detach_tree="-D" in name,
                dtype=dtype,
            )
        else:
            module = LSVC(
                channels=128,  # only the '-128' channel plumbing is coherent in
                # the reference (mvDecoder in_channels mismatch otherwise)
                use_attn="-A" in name,
                use_syn_attn="-S" in name,
                graph=graph,
                detach_tree="-D" in name,
                dtype=dtype,
            )
        family = "lsvc"
    elif name.startswith("Base"):
        if "-TINY" in name:
            # miniature Base-ER for golden-RD tests (this framework's own;
            # ships trained weights in assets/)
            module = Base(
                use_ec="-EC" in name,
                use_er="-ER" in name,
                channels_n=32,
                channels_m=48,
                channels_mv=32,
                gen_width_mv=48,
                gen_width=32,
                spynet_widths=(8, 16, 8, 4),
                spynet_kernel=5,
                warp_width=16,
                dtype=dtype,
            )
        else:
            module = Base(
                use_ec="-EC" in name, use_er="-ER" in name, dtype=dtype
            )
        family = "base"
    elif name.startswith("SSF") and "-TINY" in name:
        # miniature SSF for golden-RD tests / fast experiments (this
        # framework's own; ships trained weights in assets/).
        # 'SSF-TPU-TINY': the s2d-pipeline variant at miniature scale
        # (the Vesper-speed head-to-head rung).
        tpu = "-TPU" in name
        module = ScaleSpaceFlow(mid_planes=32, planes=48,
                                s2d=2 if tpu else 1, pipeline_s2d=tpu,
                                dtype=dtype)
        family = "ssf"
    elif name in ("SSF-Official", "SSF-TPU"):
        # 'SSF-TPU' (this framework's own variant, no reference
        # counterpart): the whole inter pipeline runs in the s2d domain
        # (no full-res 3-channel tensor at any component boundary) and
        # the scale-space prediction is the pyramid warp — full-res
        # level-0 sample through the kernel's fused s2d relayouts,
        # blurred levels built AND sampled at /2
        # (ops.warp_volume_pyramid_s2d; RD priced at the tiny golden
        # rung, tests/test_rd.py).
        tpu = name == "SSF-TPU"
        module = ScaleSpaceFlow(s2d=2 if tpu else 1, pipeline_s2d=tpu,
                                dtype=dtype)
        family = "ssf"
    elif name.startswith("ELFVC"):
        tpu = "-TPU" in name
        if "-TINY" in name:
            # miniature config for golden-RD tests / fast experiments (this
            # framework's own; ships staged-trained weights in assets/)
            module = ELFVC(
                super_prec="-SP" in name,
                sp_stage=sp_stage,
                planes=48,
                mid_planes=32,
                sp_dim=16,
                s2d=2 if tpu else 1,
                pipeline_s2d=tpu,
                dtype=dtype,
            )
        else:
            module = ELFVC(super_prec="-SP" in name, sp_stage=sp_stage,
                           s2d=2 if tpu else 1, pipeline_s2d=tpu,
                           dtype=dtype)
        family = "elfvc"
    elif name == "MCVC-Original":
        module = ScaleSpaceFlow(dtype=dtype)
        family = "ssf"
        extras["num_views"] = num_views
    elif name.startswith("MCVC"):
        widths = dict(planes=48, mid_planes=32) if "-TINY" in name else {}
        module = MCVC(
            num_views=num_views,
            imbalanced_correlation="-IA" in name,
            use_attn=use_attn,
            dtype=dtype,
            **widths,
        )
        family = "mcvc"
        extras = {"num_views": num_views, "resilience": resilience,
                  "olft": "OLFT" in name}
    else:
        raise ValueError(f"Cannot recognize codec: {name}")
    return CodecSpec(
        name=name,
        family=family,
        module=module,
        loss_type=loss_type,
        compression_level=compression_level,
        extras=extras,
    )
