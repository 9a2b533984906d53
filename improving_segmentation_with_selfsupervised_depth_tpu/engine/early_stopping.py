"""Early stopping on validation mIoU (reference utils/early_stopping.py:3-52)."""

from __future__ import annotations

from typing import Optional


class EarlyStopping:
    def __init__(self, patience: int, min_delta: float = 0.0,
                 cumulative_delta: bool = False, logger=None):
        if patience < 1:
            raise ValueError("Argument patience should be positive integer.")
        if min_delta < 0.0:
            raise ValueError("Argument min_delta should not be a negative number.")
        self.patience = patience
        self.min_delta = min_delta
        self.cumulative_delta = cumulative_delta
        self.counter = 0
        self.best_score: Optional[float] = None
        self.logger = logger

    def step(self, score: float) -> bool:
        """Returns False when training should stop."""
        if self.best_score is None:
            self.best_score = score
        elif score <= self.best_score + self.min_delta:
            if not self.cumulative_delta and score > self.best_score:
                self.best_score = score
            self.counter += 1
            if self.logger:
                self.logger.info("EarlyStopping: %i / %i", self.counter, self.patience)
            if self.counter >= self.patience:
                if self.logger:
                    self.logger.info("EarlyStopping: Stop training")
                return False
        else:
            self.best_score = score
            self.counter = 0
        return True
