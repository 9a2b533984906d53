"""Validation-time depth metrics (abs_rel, sq_rel, rms, log_rms, a1-a3).

The reference *declares* these metric names but never computes them
(reference loss/monodepth_loss.py:35-36 `self.depth_metric_names`); this
module actually wires them into the eval step so "depth abs-rel parity"
is a measurable quantity.

Ground-truth source, in priority order:
  depth_gt       a metric depth map (N, H, W, 1); pixels > 0 are valid.
                 No current loader emits it, but the key is the extension
                 point for KITTI-style LiDAR ground truth.
  pseudo_depth   the offline depth-teacher disparity (data/base.py key
                 contract). Both prediction and teacher are mapped to depth
                 through the same `disp_to_depth` so the comparison happens
                 in depth units; the bottom-10% hood rows are masked exactly
                 like the pseudo-depth training loss (train_steps.py
                 `_depth_loss_mask`, reference train.py:491-493).
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

from ..ops.geometry import disp_to_depth
from ..ops.photometric import depth_metrics


def eval_depth_metrics(cfg, batch: Dict[str, Any], outputs: Dict[str, Any]
                       ) -> Dict[str, jnp.ndarray]:
    """Return {"depth/<name>": scalar} metrics, or {} when no GT exists."""
    disp0 = outputs["disp_0"].astype(jnp.float32)
    _, pred_depth = disp_to_depth(disp0, cfg.test_min_depth, cfg.test_max_depth)

    if "depth_gt" in batch:
        gt = batch["depth_gt"].astype(jnp.float32)
        mask = (gt > 0).astype(jnp.float32)
        gt = jnp.clip(gt, cfg.test_min_depth, cfg.test_max_depth)
        m = depth_metrics(pred_depth, gt, mask)
    elif "pseudo_depth" in batch:
        pd = batch["pseudo_depth"].astype(jnp.float32)
        _, gt_depth = disp_to_depth(pd, cfg.test_min_depth, cfg.test_max_depth)
        h = disp0.shape[1]
        row = jnp.arange(h).reshape(1, h, 1, 1)
        mask = jnp.broadcast_to(row < int(h * 0.9), disp0.shape)
        m = depth_metrics(pred_depth, gt_depth, mask)
    else:
        return {}
    return {f"depth/{k}": v for k, v in m.items()}
