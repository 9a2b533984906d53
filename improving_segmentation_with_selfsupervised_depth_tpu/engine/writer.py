"""Metrics/observability sink: tensorboard when available, JSONL always.

Counterpart of the reference's two SummaryWriters (train.py:952-953) with the
same scalar families (training/*, validation/*, val_metrics/*) plus a JSONL
stream for headless runs.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


class MetricsWriter:
    def __init__(self, logdir: str, enable_tensorboard: bool = True):
        self.logdir = logdir
        os.makedirs(logdir, exist_ok=True)
        self._jsonl = open(os.path.join(logdir, "metrics.jsonl"), "a")
        self._tb = None
        if enable_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(logdir)
            except Exception:
                self._tb = None

    def get_logdir(self) -> str:
        return self.logdir

    def add_scalar(self, tag: str, value, step: int):
        value = float(value)
        self._jsonl.write(json.dumps({"t": time.time(), "tag": tag,
                                      "value": value, "step": int(step)}) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)

    def add_image(self, tag: str, img: np.ndarray, step: int, dataformats: str = "HWC"):
        if self._tb is not None:
            self._tb.add_image(tag, img, step, dataformats=dataformats)

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
