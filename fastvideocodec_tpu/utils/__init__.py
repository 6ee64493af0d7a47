from fastvideocodec_tpu.utils.logs import read_eval_log, write_eval_log
from fastvideocodec_tpu.utils.meters import AverageMeter, StageTimers, xprof_trace

__all__ = [
    "AverageMeter",
    "StageTimers",
    "read_eval_log",
    "write_eval_log",
    "xprof_trace",
]
