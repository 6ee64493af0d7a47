from fastvideocodec_tpu.train.checkpoint import (
    load_checkpoint,
    load_whatever,
    load_with_copy,
    save_checkpoint,
)
from fastvideocodec_tpu.train.trainer import (
    TrainConfig,
    gop_loss,
    make_eval_step,
    make_train_step,
)

__all__ = [
    "TrainConfig",
    "gop_loss",
    "load_checkpoint",
    "load_whatever",
    "load_with_copy",
    "make_eval_step",
    "make_train_step",
    "save_checkpoint",
]
