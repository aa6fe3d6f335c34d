from infodiffusion_tpu.train.state import (
    TrainState,
    create_train_state,
    make_optimizer,
    warmup_cosine_schedule,
)
from infodiffusion_tpu.train.step import make_train_step
from infodiffusion_tpu.train.checkpoint import (
    latest_checkpoint_epoch,
    restore_checkpoint,
    save_checkpoint,
)

__all__ = [
    "TrainState",
    "create_train_state",
    "make_optimizer",
    "warmup_cosine_schedule",
    "make_train_step",
    "save_checkpoint",
    "restore_checkpoint",
    "latest_checkpoint_epoch",
]
