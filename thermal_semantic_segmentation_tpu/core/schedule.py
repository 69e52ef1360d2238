"""LR schedules. ReduceLROnPlateau mirrors torch defaults
(torch.optim.lr_scheduler.ReduceLROnPlateau: factor=0.1, patience=10,
threshold=1e-4 'rel', cooldown=0), used at segmentation_train.py:172 and
self_train_main.py:67."""

from __future__ import annotations


class ReduceLROnPlateau:
    def __init__(self, mode: str = "min", factor: float = 0.1, patience: int = 10,
                 threshold: float = 1e-4, cooldown: int = 0, min_scale: float = 0.0):
        assert mode in ("min", "max")
        self.mode = mode
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.cooldown = cooldown
        self.min_scale = min_scale
        self.best = None
        self.num_bad = 0
        self.cooldown_counter = 0
        self.scale = 1.0

    def _is_better(self, value: float) -> bool:
        if self.best is None:
            return True
        if self.mode == "min":
            return value < self.best * (1.0 - self.threshold)
        return value > self.best * (1.0 + self.threshold)

    def step(self, value: float) -> float:
        """Feed the monitored metric; returns the current LR scale factor."""
        if self._is_better(value):
            self.best = value
            self.num_bad = 0
        elif self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.scale = max(self.scale * self.factor, self.min_scale)
                self.cooldown_counter = self.cooldown
                self.num_bad = 0
        return self.scale


def poly_lr(base_lr: float, step: int, num_steps: int, power: float = 0.9) -> float:
    """Poly decay helper (models/deeplabv2.py:323-327)."""
    return base_lr * (1.0 - step / num_steps) ** power
