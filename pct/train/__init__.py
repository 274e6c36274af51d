from pct.train.losses import frame_rd_loss
from pct.train.step import (
    TrainConfig,
    make_optimizer,
    make_train_step,
    batch_rd_loss,
    arrays_to_training_batch,
    frames_to_training_batch,
)

__all__ = [
    "frame_rd_loss",
    "TrainConfig",
    "make_optimizer",
    "make_train_step",
    "batch_rd_loss",
    "arrays_to_training_batch",
    "frames_to_training_batch",
]
