from fastvideocodec_tpu.models.base import Base
from fastvideocodec_tpu.models.dvc import DVC
from fastvideocodec_tpu.models.elfvc import ELFVC, ElfvcState
from fastvideocodec_tpu.models.lsvc import LSVC
from fastvideocodec_tpu.models.mcvc import MCVC, mask_views, sample_view_mask
from fastvideocodec_tpu.models.registry import (
    I_LEVELS,
    MSSSIM_LAMBDAS,
    PSNR_LAMBDAS,
    CodecSpec,
    get_codec_model,
)
from fastvideocodec_tpu.models.rlvc import RLVC, Coder2D, RlvcHidden
from fastvideocodec_tpu.models.ssf import ScaleSpaceFlow

__all__ = [
    "Base",
    "Coder2D",
    "CodecSpec",
    "DVC",
    "ELFVC",
    "ElfvcState",
    "I_LEVELS",
    "LSVC",
    "MCVC",
    "MSSSIM_LAMBDAS",
    "PSNR_LAMBDAS",
    "RLVC",
    "RlvcHidden",
    "ScaleSpaceFlow",
    "get_codec_model",
    "mask_views",
    "sample_view_mask",
]
