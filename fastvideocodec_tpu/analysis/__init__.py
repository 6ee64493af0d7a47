from fastvideocodec_tpu.analysis.abr import AbrConfig, bola_simulate, segment_tables
from fastvideocodec_tpu.analysis.bdrate import bd_psnr, bd_rate

__all__ = ["AbrConfig", "bd_psnr", "bd_rate", "bola_simulate", "segment_tables"]
