"""On-device segmentation metrics: confusion-matrix accumulation + IoU family.

Re-design of the reference's host-side numpy `runningScore`
(evaluation/metrics.py:7-55): the (C, C) confusion matrix is accumulated on
device inside the jitted eval step (one scatter-add per batch) and only the
final (C, C) matrix crosses to the host. Under a data-parallel mesh the
accumulation psum-reduces automatically via jnp.sum over the sharded batch.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def confusion_matrix(label_true: jnp.ndarray, label_pred: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """(..., ) int labels -> (C, C) float32 counts; rows = truth, cols = pred.

    Pixels with true label outside [0, C) are ignored (reference
    evaluation/metrics.py:12-17 `_fast_hist`).
    """
    lt = label_true.reshape(-1)
    lp = label_pred.reshape(-1)
    valid = (lt >= 0) & (lt < num_classes)
    # scatter-free one-hot matmul formulation: rides the MXU instead of a
    # serialized TPU scatter (invalid rows one-hot to all-zero)
    oh_t = jax.nn.one_hot(jnp.where(valid, lt, -1), num_classes, dtype=jnp.float32)
    oh_p = jax.nn.one_hot(jnp.clip(lp, 0, num_classes - 1), num_classes, dtype=jnp.float32)
    return jnp.einsum("pc,pd->cd", oh_t, oh_p, precision=jax.lax.Precision.HIGHEST)


def scores_from_confusion(hist: np.ndarray) -> Tuple[Dict[str, float], Dict[int, float]]:
    """Overall/mean acc, fwAcc, mIoU and per-class IoU from a (C, C) matrix.

    Matches reference evaluation/metrics.py:27-52 (nan-mean over classes with
    no support).
    """
    hist = np.asarray(hist, dtype=np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        acc = np.diag(hist).sum() / hist.sum()
        acc_cls = np.nanmean(np.diag(hist) / hist.sum(axis=1))
        iu = np.diag(hist) / (hist.sum(axis=1) + hist.sum(axis=0) - np.diag(hist))
        mean_iu = np.nanmean(iu)
        freq = hist.sum(axis=1) / hist.sum()
        fwavacc = (freq[freq > 0] * iu[freq > 0]).sum()
    cls_iu = dict(zip(range(hist.shape[0]), iu))
    return (
        {
            "Overall Acc: \t": float(acc),
            "Mean Acc : \t": float(acc_cls),
            "FreqW Acc : \t": float(fwavacc),
            "Mean IoU : \t": float(mean_iu),
        },
        cls_iu,
    )


class RunningScore:
    """Host-side accumulator with the reference `runningScore` interface,
    backed by on-device `confusion_matrix`."""

    def __init__(self, n_classes: int):
        self.n_classes = n_classes
        self.reset()

    def update(self, label_trues, label_preds):
        self.mat = self.mat + np.asarray(
            confusion_matrix(jnp.asarray(label_trues), jnp.asarray(label_preds), self.n_classes)
        )

    def update_matrix(self, mat):
        self.mat = self.mat + np.asarray(mat)

    def get_scores(self):
        return scores_from_confusion(self.mat)

    def reset(self):
        self.mat = np.zeros((self.n_classes, self.n_classes), dtype=np.float64)


class AverageMeter:
    """Reference evaluation/metrics.py:58-76."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n=1):
        val = float(val)
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count


class AverageMeterDict:
    """Reference evaluation/metrics.py:79-99."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.avgs = {}
        self.sums = {}
        self.counts = {}

    def update(self, vals, n=1):
        for k, v in vals.items():
            v = float(v)
            if k not in self.sums:
                self.sums[k] = 0.0
                self.counts[k] = 0
            self.sums[k] += v * n
            self.counts[k] += n
            self.avgs[k] = self.sums[k] / self.counts[k]
