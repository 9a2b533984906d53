"""Sample scoring for label selection — on-device, jittable pieces.

Re-design of reference label_selection.py:339-648:
- per-sample score = depth_lambda * depth_error + entropy_lambda * entropy
  with the depth error computed between the student's disp_0 and the SDE
  teacher's pseudo-depth under moving-car + ego-car masks (447-487)
- diversity features: pooled depth-decoder activations (u3/u4/bottleneck/
  pseudo-depth), pairwise L_p distances (+ score bias), greedy iterative
  farthest point (574-648)

The reference scores at batch-size 1 in a python loop; here the per-sample
math is a jitted batched function and the pairwise distance matrix is one
device matmul-shaped cdist.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax.numpy as jnp
import numpy as np
from jax import lax


def dilate(mask: jnp.ndarray, kernel_size: int, padding: int) -> jnp.ndarray:
    """Binary dilation == clamp(conv with ones) (reference 339-345).
    mask: (..., H, W)."""
    pad = int(padding)
    window = [1] * (mask.ndim - 2) + [kernel_size, kernel_size]
    strides = [1] * mask.ndim
    pads = [(0, 0)] * (mask.ndim - 2) + [(pad, pad), (pad, pad)]
    return lax.reduce_window(mask, -jnp.inf, lax.max, window, strides, pads).clip(0.0, 1.0)


def adaptive_pool(x: jnp.ndarray, out_hw, mode: str = "avg") -> jnp.ndarray:
    """torch adaptive_{avg,max}_pool2d semantics on (..., H, W, C) NHWC."""
    h_out, w_out = out_hw
    *lead, h, w, c = x.shape

    def pool_axis(arr, axis_len, n_bins, axis):
        chunks = []
        for i in range(n_bins):
            lo = (i * axis_len) // n_bins
            hi = -(-(i + 1) * axis_len // n_bins)
            sl = [slice(None)] * arr.ndim
            sl[axis] = slice(lo, hi)
            seg = arr[tuple(sl)]
            red = jnp.mean(seg, axis=axis, keepdims=True) if mode == "avg" else \
                jnp.max(seg, axis=axis, keepdims=True)
            chunks.append(red)
        return jnp.concatenate(chunks, axis=axis)

    x = pool_axis(x, h, h_out, x.ndim - 3)
    x = pool_axis(x, w, w_out, x.ndim - 2)
    return x


def depth_error_map(disp_pred: jnp.ndarray, disp_pseudo: jnp.ndarray,
                    error_type: str) -> jnp.ndarray:
    """One of the depth-error variants (reference 458-478). (H, W) inputs."""
    if error_type == "abs":
        m = jnp.abs(disp_pred - disp_pseudo)
    elif error_type == "abs_inv_log":
        m = jnp.abs(jnp.log(jnp.clip(1 / disp_pseudo, 0.1, 80))
                    - jnp.log(jnp.clip(1 / disp_pred, 0.1, 80)))
    elif error_type == "abs_inv":
        m = jnp.abs(jnp.clip(1 / disp_pseudo, 0.1, 80) - jnp.clip(1 / disp_pred, 0.1, 80))
    elif error_type == "sq":
        m = (disp_pred - disp_pseudo) ** 2
    elif error_type == "abs_rel":
        m = jnp.abs(disp_pred - disp_pseudo) / (disp_pseudo + 1e-1)
    elif error_type == "sq_rel":
        m = ((disp_pred - disp_pseudo) ** 2) / (disp_pseudo + 1e-1)
    elif error_type == "abs_log":
        m = jnp.abs(jnp.log1p(disp_pred) - jnp.log1p(disp_pseudo))
    else:
        raise NotImplementedError(error_type)
    return m


def masked_depth_error(disp_pred: jnp.ndarray, disp_pseudo: jnp.ndarray,
                       error_type: str):
    """Apply moving-car + ego-car masks and reduce (reference 480-487).
    (H, W) -> (map, scalar)."""
    m = depth_error_map(disp_pred, disp_pseudo, error_type)
    moving = dilate((disp_pseudo < 0.07).astype(jnp.float32)[None, None], 7, 3)[0, 0]
    m = m * (1.0 - moving)
    h = m.shape[0]
    rows = jnp.arange(h).reshape(h, 1)
    m = jnp.where(rows < int(0.87 * h), m, 0.0)
    return m, jnp.mean(m)


def extract_depth_features(teacher_outputs: Dict[str, jnp.ndarray],
                           pseudo_depth: Optional[jnp.ndarray],
                           ifp_args: Dict[str, Any]) -> jnp.ndarray:
    """Diversity feature per sample (reference 399-428). Returns (N, h, 2h, C)."""
    m = ifp_args["m"]
    hh = ifp_args["h"]
    mode = ifp_args.get("pool", "avg")
    if m == "u3":
        feats = teacher_outputs["upconv_3"]
    elif m == "u4":
        feats = teacher_outputs["upconv_4"]
    elif m == "bn":
        feats = teacher_outputs["bottleneck"]
    elif m == "logdepth":
        feats = jnp.log(jnp.clip(1 / pseudo_depth, 0.1, 80))
    elif m == "depth":
        feats = jnp.clip(1 / pseudo_depth, 0.1, 80)
    else:
        raise NotImplementedError(m)
    return adaptive_pool(feats, (hh, 2 * hh), mode)


def calc_feature_distance(features: np.ndarray, bias: Optional[np.ndarray],
                          bias_weight: float, p: int = 2,
                          normalize_features: bool = False,
                          patch_wise: bool = False) -> np.ndarray:
    """Pairwise L_p distance matrix over pooled features, with optional
    per-column score bias (reference _calc_feature_distance, 574-624).

    features: (N, h, w, C) NHWC.
    """
    feats = jnp.asarray(features, jnp.float32)
    n, h, w, c = feats.shape
    if normalize_features:
        mean = jnp.mean(feats, axis=(0, 1, 2), keepdims=True)
        # torch.std_mean uses the unbiased estimator
        std = jnp.std(feats, axis=(0, 1, 2), keepdims=True, ddof=1)
        feats = (feats - mean) / std

    def cdist(a, b):
        if p == 2:
            # |a-b|^2 = |a|^2 + |b|^2 - 2ab — one big MXU matmul
            aa = jnp.sum(a * a, axis=1, keepdims=True)
            bb = jnp.sum(b * b, axis=1, keepdims=True)
            d2 = aa + bb.T - 2.0 * a @ b.T
            return jnp.sqrt(jnp.maximum(d2, 0.0))
        return jnp.sum(jnp.abs(a[:, None, :] - b[None, :, :]) ** p, axis=-1) ** (1.0 / p)

    if patch_wise:
        # min-over-patches chamfer-style distance (reference 582-612)
        px = feats.reshape(n * h * w, c)
        d = cdist(px, px).reshape(n, h * w, n, h * w)
        d = jnp.min(d, axis=-1)
        dist = jnp.mean(jnp.transpose(d, (0, 2, 1)), axis=-1)
    else:
        flat = feats.reshape(n, h * w * c)
        dist = cdist(flat, flat)

    if bias_weight > 0 and bias is not None:
        dist = dist + jnp.asarray(bias, jnp.float32)[None, :]
    dist = dist * (1.0 - jnp.eye(n))
    return np.asarray(dist)


def iterative_farthest_point(current_samples: List[int], feature_distances: Dict[str, Any],
                             n_new: int, preselected_samples: Optional[List[int]] = None):
    """Greedy max-min farthest-point selection (reference 627-648)."""
    dist = np.array(feature_distances["distances"], copy=True)
    dist_i_to_img_idx = feature_distances["dist_i_to_img_idx"]
    img_idx_to_dist_i = feature_distances["img_idx_to_dist_i"]
    current = [img_idx_to_dist_i[s] for s in current_samples]
    if preselected_samples is not None:
        pres = {img_idx_to_dist_i[s] for s in preselected_samples}
        ignored = [i for i in range(dist.shape[0]) if i not in pres]
        dist[:, ignored] = 0
    new_samples, distances = [], []
    for _ in range(n_new):
        to_current = dist[current, :]
        min_to_current = np.min(to_current, axis=0)
        new_sample = int(np.argmax(min_to_current))
        if new_sample in current:
            break
        current.append(new_sample)
        new_samples.append(new_sample)
        distances.append(float(min_to_current[new_sample]))
    return [dist_i_to_img_idx[s] for s in new_samples], distances
