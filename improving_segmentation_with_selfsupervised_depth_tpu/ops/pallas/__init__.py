"""Pallas TPU kernels for the hot ops of the photometric pipeline."""

from .reprojection import (
    fused_reprojection_error,
    fused_reprojection_error_diff,
    fused_reprojection_error_grad,
)
from .warp import bilinear_warp_corners, unnormalize_grid

__all__ = [
    "fused_reprojection_error",
    "fused_reprojection_error_diff",
    "fused_reprojection_error_grad",
    "bilinear_warp_corners",
    "unnormalize_grid",
]
