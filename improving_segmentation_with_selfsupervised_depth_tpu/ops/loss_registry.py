"""Loss registry (reference loss/__init__.py:16-37).

`get_segmentation_loss_function(cfg)` resolves the configured segmentation
loss (the reference supports 'cross_entropy' only);
`get_monodepth_loss(cfg, is_train)` returns the photometric-loss callables
bound to the config's geometry (the functional analogue of the reference's
train/val MonodepthLoss instances — shapes specialize at trace time so no
batch-size binding is needed).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict

from . import photometric
from .losses import cross_entropy2d


def get_segmentation_loss_function(cfg: Dict[str, Any]) -> Callable:
    name = (cfg.get("training", {}).get("segmentation_loss") or {}).get(
        "name", "cross_entropy")
    if name != "cross_entropy":
        raise NotImplementedError(f"Segmentation loss {name} not implemented")
    return cross_entropy2d


def get_monodepth_loss(cfg: Dict[str, Any], is_train: bool = True):
    """Returns (generate_images_pred, compute_losses, generate_depth_test_pred)
    partials bound to the config's scales/frames/depth range."""
    mono = dict(cfg.get("monodepth_options", {}))
    mono.update(cfg.get("training", {}).get("monodepth_loss") or {})
    scales = tuple(range(mono.get("num_scales", 4)))
    frame_ids = tuple(mono.get("frame_ids", (0, -1, 1)))
    gen = functools.partial(
        photometric.generate_images_pred, scales=scales, frame_ids=frame_ids,
        min_depth=mono.get("min_depth", 0.1), max_depth=mono.get("max_depth", 100.0))
    compute = functools.partial(
        photometric.compute_losses, scales=scales, frame_ids=frame_ids,
        disparity_smoothness=mono.get("disparity_smoothness", 1e-3),
        no_ssim=mono.get("no_ssim", False),
        avg_reprojection=mono.get("avg_reprojection", False),
        disable_automasking=mono.get("disable_automasking", False))
    test_pred = functools.partial(
        photometric.generate_depth_test_pred, scales=scales,
        test_min_depth=mono.get("test_min_depth", mono.get("min_depth", 0.1)),
        test_max_depth=mono.get("test_max_depth", mono.get("max_depth", 100.0)))
    return gen, compute, test_pred
