"""Pallas TPU kernels for the hot ops of the photometric pipeline."""

from .reprojection import fused_reprojection_error

__all__ = ["fused_reprojection_error"]
