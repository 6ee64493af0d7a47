from fastvideocodec_tpu.train.checkpoint import (
    load_checkpoint,
    load_whatever,
    load_with_copy,
    save_checkpoint,
)
from fastvideocodec_tpu.train.trainer import (
    TrainConfig,
    elfvc_stage_trainable,
    gop_loss,
    make_elfvc_stage_optimizer,
    make_eval_step,
    make_optimizer,
    make_train_step,
)

__all__ = [
    "TrainConfig",
    "elfvc_stage_trainable",
    "gop_loss",
    "load_checkpoint",
    "load_whatever",
    "load_with_copy",
    "make_elfvc_stage_optimizer",
    "make_eval_step",
    "make_optimizer",
    "make_train_step",
    "save_checkpoint",
]
