"""Pure-functional tensor ops: the TPU compute path.

All ops take/return `jnp.ndarray` in NHWC layout and are jit/pjit friendly
(static shapes, no data-dependent python control flow).
"""

from .resize import resize_bilinear, resize_nearest, upsample2x_nearest
from .resample import grid_sample
from .geometry import (
    disp_to_depth,
    rot_from_axisangle,
    get_translation_matrix,
    transformation_from_parameters,
    backproject_depth,
    project_3d,
)
from .image import ssim, smoothness_loss, gaussian_blur, color_jitter
from .losses import cross_entropy2d, berhu, pixel_wise_entropy

__all__ = [
    "resize_bilinear",
    "resize_nearest",
    "upsample2x_nearest",
    "grid_sample",
    "disp_to_depth",
    "rot_from_axisangle",
    "get_translation_matrix",
    "transformation_from_parameters",
    "backproject_depth",
    "project_3d",
    "ssim",
    "smoothness_loss",
    "gaussian_blur",
    "color_jitter",
    "cross_entropy2d",
    "berhu",
    "pixel_wise_entropy",
]
