"""LR schedules: reduce-on-plateau (the reference's training schedule).

The reference drives AdamW with torch's ``ReduceLROnPlateau`` on validation
RMSE (``examples/training.py:76-87``).  Optax has no stateful plateau
scheduler that fits the functional step, so we provide a small host-side
controller plus an optax ``inject_hyperparams`` wiring.
"""

import typing as tp

import optax

__all__ = ["ReduceLROnPlateau", "adamw_with_plateau"]


class ReduceLROnPlateau:
    """Host-side plateau controller: call ``update(metric)`` per validation."""

    def __init__(
        self,
        initial_lr: float = 1e-3,
        factor: float = 0.5,
        patience: int = 100,
        threshold: float = 0.0,
        min_lr: float = 1e-9,
    ) -> None:
        self.lr = initial_lr
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.min_lr = min_lr
        self.best: tp.Optional[float] = None
        self.bad_epochs = 0

    def update(self, metric: float) -> float:
        """Record a validation metric; returns the (possibly reduced) LR."""
        if self.best is None or metric < self.best - self.threshold:
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.bad_epochs = 0
        return self.lr


def adamw_with_plateau(
    initial_lr: float = 1e-3, weight_decay: float = 1e-6
) -> tp.Tuple[optax.GradientTransformation, ReduceLROnPlateau]:
    """AdamW whose LR is a hyperparameter settable from the plateau controller.

    Usage::

        optimizer, plateau = adamw_with_plateau(1e-3)
        ...
        state.opt_state.hyperparams["learning_rate"] = plateau.update(val_rmse)
    """
    optimizer = optax.inject_hyperparams(optax.adamw)(
        learning_rate=initial_lr, weight_decay=weight_decay
    )
    return optimizer, ReduceLROnPlateau(initial_lr)
