from fastvideocodec_tpu.ops.math import (
    bits_estimate,
    bits_estimate_unclamped,
    build_indexes,
    gaussian_likelihood,
    laplace_likelihood,
    lower_bound,
    psnr,
    quantize,
    quantize_noise,
    quantize_ste,
    scale_table,
)
from fastvideocodec_tpu.ops.warp import (
    avg_pool2,
    bilinear_upsample_x2,
    bilinear_upsample_x2_ac,
    flow_warp,
    gaussian_volume,
    grid_sample_bilinear,
    warp_volume,
)
from fastvideocodec_tpu.ops.gdn import GDN
from fastvideocodec_tpu.ops.msssim import ms_ssim, msssim_db

__all__ = [
    "GDN",
    "avg_pool2",
    "bilinear_upsample_x2",
    "bilinear_upsample_x2_ac",
    "bits_estimate",
    "bits_estimate_unclamped",
    "build_indexes",
    "flow_warp",
    "gaussian_likelihood",
    "gaussian_volume",
    "grid_sample_bilinear",
    "laplace_likelihood",
    "lower_bound",
    "ms_ssim",
    "msssim_db",
    "psnr",
    "quantize",
    "quantize_noise",
    "quantize_ste",
    "scale_table",
    "warp_volume",
]
