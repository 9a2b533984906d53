"""Monodepth camera geometry as pure functions.

Functional re-design of the reference's stateful geometry modules
(models/monodepth_layers.py): the fixed meshgrid buffers of `BackprojectDepth`
(monodepth_layers.py:145-174) become trace-time constants that XLA
constant-folds; everything is batched einsum that maps onto the MXU.

Layout: NHWC. Depth/disp tensors are (N, H, W, 1); matrices are (N, 4, 4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def disp_to_depth(disp: jnp.ndarray, min_depth: float, max_depth: float):
    """Sigmoid disparity -> (scaled_disp, depth).

    Reference models/monodepth_layers.py:18-27.
    """
    min_disp = 1.0 / max_depth
    max_disp = 1.0 / min_depth
    scaled_disp = min_disp + (max_disp - min_disp) * disp
    depth = 1.0 / scaled_disp
    return scaled_disp, depth


def rot_from_axisangle(vec: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (N, 3) -> rotation as (N, 4, 4) homogeneous matrix.

    Rodrigues formula; matches reference models/monodepth_layers.py:66-105.
    """
    vec = vec.reshape(-1, 3)
    angle = jnp.linalg.norm(vec, axis=-1, keepdims=True)  # (N,1)
    axis = vec / (angle + 1e-7)

    ca = jnp.cos(angle)[..., 0]
    sa = jnp.sin(angle)[..., 0]
    C = 1.0 - ca

    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    xs, ys, zs = x * sa, y * sa, z * sa
    xC, yC, zC = x * C, y * C, z * C
    xyC, yzC, zxC = x * yC, y * zC, z * xC

    zeros = jnp.zeros_like(x)
    ones = jnp.ones_like(x)
    rot = jnp.stack(
        [
            x * xC + ca, xyC - zs, zxC + ys, zeros,
            xyC + zs, y * yC + ca, yzC - xs, zeros,
            zxC - ys, yzC + xs, z * zC + ca, zeros,
            zeros, zeros, zeros, ones,
        ],
        axis=-1,
    ).reshape(-1, 4, 4)
    return rot


def get_translation_matrix(t: jnp.ndarray) -> jnp.ndarray:
    """Translation (N, 3) -> (N, 4, 4). Reference monodepth_layers.py:50-63."""
    t = t.reshape(-1, 3)
    n = t.shape[0]
    eye = jnp.broadcast_to(jnp.eye(4, dtype=t.dtype), (n, 4, 4))
    return eye.at[:, :3, 3].set(t)


def transformation_from_parameters(
    axisangle: jnp.ndarray, translation: jnp.ndarray, invert: bool = False
) -> jnp.ndarray:
    """(axisangle (N,1,3) or (N,3), translation alike) -> SE3 (N,4,4).

    Reference models/monodepth_layers.py:30-47.
    """
    R = rot_from_axisangle(axisangle.reshape(-1, 3))
    t = translation.reshape(-1, 3)
    if invert:
        R = jnp.swapaxes(R, 1, 2)
        t = -t
    T = get_translation_matrix(t)
    if invert:
        return jnp.einsum("nij,njk->nik", R, T, precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("nij,njk->nik", T, R, precision=jax.lax.Precision.HIGHEST)


def _pix_coords(h: int, w: int) -> np.ndarray:
    """Homogeneous pixel grid (3, H*W) — trace-time constant."""
    xs, ys = np.meshgrid(np.arange(w), np.arange(h), indexing="xy")
    ones = np.ones_like(xs)
    return np.stack([xs, ys, ones], axis=0).reshape(3, h * w).astype(np.float32)


def backproject_depth(depth: jnp.ndarray, inv_K: jnp.ndarray) -> jnp.ndarray:
    """Depth (N, H, W, 1) + inv_K (N, 4, 4) -> homogeneous cam points (N, 4, H*W).

    Reference models/monodepth_layers.py:145-174.
    """
    n, h, w, _ = depth.shape
    pix = jnp.asarray(_pix_coords(h, w))  # (3, HW)
    # Unrolled (N,3,3)x(3,HW) contraction: a K=3 dot_general lowers to a
    # ~0.3 TF/s tiny-matmul custom call on TPU (measured ~1 ms per call in
    # the train step, 8 calls/step with an equally slow transpose); three
    # broadcast FMAs fuse into the surrounding elementwise graph instead.
    ik = inv_K[:, :3, :3]
    cam = (ik[:, :, 0:1] * pix[0] + ik[:, :, 1:2] * pix[1]
           + ik[:, :, 2:3] * pix[2])                       # (N,3,HW)
    cam = depth.reshape(n, 1, h * w) * cam
    ones = jnp.ones((n, 1, h * w), dtype=cam.dtype)
    return jnp.concatenate([cam, ones], axis=1)


def project_3d(
    points: jnp.ndarray, K: jnp.ndarray, T: jnp.ndarray, h: int, w: int, eps: float = 1e-7
) -> jnp.ndarray:
    """Project cam points (N, 4, H*W) through K@T into a normalized sampling
    grid (N, H, W, 2) with x,y in [-1, 1].

    Reference models/monodepth_layers.py:177-199.
    """
    n = points.shape[0]
    P = jnp.einsum("nij,njk->nik", K, T, precision=jax.lax.Precision.HIGHEST)[:, :3, :]  # (N,3,4)
    # Unrolled K=4 contraction over the point cloud — see backproject_depth
    # (dot_general at this shape is a tiny-matmul custom call, ~0.3 TF/s;
    # four broadcast FMAs fuse for free and the VJP is elementwise too).
    cam = (P[:, :, 0:1] * points[:, 0:1] + P[:, :, 1:2] * points[:, 1:2]
           + P[:, :, 2:3] * points[:, 2:3] + P[:, :, 3:4] * points[:, 3:4])  # (N,3,HW)
    pix = cam[:, :2, :] / (cam[:, 2:3, :] + eps)  # (N,2,HW)
    pix = pix.reshape(n, 2, h, w)
    px = pix[:, 0] / (w - 1)
    py = pix[:, 1] / (h - 1)
    grid = jnp.stack([px, py], axis=-1)  # (N,H,W,2)
    return (grid - 0.5) * 2.0
