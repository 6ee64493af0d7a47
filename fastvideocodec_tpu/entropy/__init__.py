from fastvideocodec_tpu.entropy.bit_estimator import BitEstimator, Bitparm
from fastvideocodec_tpu.entropy.factorized import (
    EntropyBottleneck,
    build_cdf_tables,
    pmf_to_quantized_cdf,
)
from fastvideocodec_tpu.entropy.gaussian import GaussianConditional, LaplaceConditional
from fastvideocodec_tpu.entropy.hyperprior import MeanScaleHyperPriors, SSFHyperprior
from fastvideocodec_tpu.entropy.rpm import RPM, RecProbModel

__all__ = [
    "BitEstimator",
    "Bitparm",
    "EntropyBottleneck",
    "GaussianConditional",
    "LaplaceConditional",
    "MeanScaleHyperPriors",
    "RPM",
    "RecProbModel",
    "SSFHyperprior",
    "build_cdf_tables",
    "pmf_to_quantized_cdf",
]
