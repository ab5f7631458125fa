from crosstalk_tpu.train.loop import train_model
from crosstalk_tpu.train.schedules import (
    ReduceLROnPlateau,
    Schedule,
    onecycle_lr,
    warmup_cosine_lr,
)
from crosstalk_tpu.train.steps import (
    TrainState,
    batch_sharding,
    init_train_state,
    make_optimizer,
    make_train_step,
    make_val_step,
    replicate_state,
)

__all__ = [
    "train_model",
    "TrainState",
    "make_optimizer",
    "init_train_state",
    "make_train_step",
    "make_val_step",
    "batch_sharding",
    "replicate_state",
    "Schedule",
    "ReduceLROnPlateau",
    "onecycle_lr",
    "warmup_cosine_lr",
]
