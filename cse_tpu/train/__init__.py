from cse_tpu.train.checkpoint import (
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from cse_tpu.train.loop import train_net
from cse_tpu.train.optimizer import build_optimizer
from cse_tpu.train.schedules import (
    ReduceLROnPlateau,
    cosine_warmup_schedule,
    linear_warmup_schedule,
)
from cse_tpu.train.step import TrainConfig, make_eval_step, make_train_step

__all__ = [
    "latest_checkpoint", "restore_checkpoint", "save_checkpoint", "train_net",
    "build_optimizer", "ReduceLROnPlateau", "cosine_warmup_schedule",
    "linear_warmup_schedule", "TrainConfig", "make_eval_step", "make_train_step",
]
