from fastvideocodec_tpu.utils.flowviz import flow_to_image, read_flo, write_flo
from fastvideocodec_tpu.utils.logs import read_eval_log, write_eval_log
from fastvideocodec_tpu.utils.meters import AverageMeter, StageTimers, xprof_trace

__all__ = [
    "flow_to_image",
    "read_flo",
    "write_flo",
    "AverageMeter",
    "StageTimers",
    "read_eval_log",
    "write_eval_log",
    "xprof_trace",
]
