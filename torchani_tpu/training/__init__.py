"""Training stack: losses, train step, data-parallel sharding."""

from torchani_tpu.training.loop import (
    TrainState,
    energy_force_loss,
    make_train_step,
)

__all__ = ["TrainState", "energy_force_loss", "make_train_step"]
