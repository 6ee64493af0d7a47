from fastvideocodec_tpu.analysis.abr import AbrConfig, bola_simulate, segment_tables
from fastvideocodec_tpu.analysis.bdrate import bd_psnr, bd_rate
from fastvideocodec_tpu.analysis.trace_sim import read_avg_log, simulate_over_trace

__all__ = [
    "AbrConfig",
    "bd_psnr",
    "bd_rate",
    "bola_simulate",
    "read_avg_log",
    "segment_tables",
    "simulate_over_trace",
]
