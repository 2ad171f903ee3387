"""Training stack: losses, train step, data-parallel sharding."""

from torchani_tpu.training.checkpoints import (
    load_checkpoint,
    merge_members,
    save_checkpoint,
)
from torchani_tpu.training.schedules import ReduceLROnPlateau, adamw_with_plateau
from torchani_tpu.training.loop import (
    TrainState,
    energy_force_loss,
    make_train_step,
)

__all__ = [
    "TrainState",
    "energy_force_loss",
    "make_train_step",
    "save_checkpoint",
    "load_checkpoint",
    "merge_members",
    "ReduceLROnPlateau",
    "adamw_with_plateau",
]
