"""Plateau-based early stopping for the validation-mIoU loop.

Semantics follow the reference's handler (utils/early_stopping.py:3-52, itself
adapted from pytorch-ignite): an eval "improves" only when the score exceeds
the running best by more than `min_delta`; after `patience` consecutive
non-improving evals, training stops. With `cumulative_delta=False` (default)
the running best still tracks any strictly-higher score, so the margin is
measured against the latest high-water mark; with `cumulative_delta=True` the
best only moves on a qualifying improvement, so small gains must accumulate
past `min_delta` since the last reset to count.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass
class EarlyStopping:
    patience: int
    min_delta: float = 0.0
    cumulative_delta: bool = False
    logger: Optional[object] = None

    best_score: Optional[float] = dataclasses.field(default=None, init=False)
    counter: int = dataclasses.field(default=0, init=False)

    def __post_init__(self):
        if self.patience < 1:
            raise ValueError("Argument patience should be positive integer.")
        if self.min_delta < 0.0:
            raise ValueError("Argument min_delta should not be a negative number.")

    def step(self, score: float) -> bool:
        """Record one validation score; False means training should stop."""
        prev_best = self.best_score
        improved = prev_best is None or score > prev_best + self.min_delta

        if improved:
            self.best_score = score
            self.counter = 0
            return True

        # Non-qualifying eval. Outside cumulative mode the high-water mark
        # still advances on any strict gain.
        if not self.cumulative_delta and score > prev_best:
            self.best_score = score
        self.counter += 1
        if self.logger:
            self.logger.info("EarlyStopping: %i / %i", self.counter, self.patience)
        if self.counter >= self.patience:
            if self.logger:
                self.logger.info("EarlyStopping: Stop training")
            return False
        return True
