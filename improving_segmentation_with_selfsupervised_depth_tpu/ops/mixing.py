"""DepthMix / ClassMix mask generation and batch mixing — on-device, jittable.

Re-designs the reference's host-side, data-dependent mask generation
(train.py:572-642, loader/transformmasks.py, loader/transformsgpu.py) into
fixed-shape XLA programs:

- ClassMix: the reference picks a random half of the classes *present* in each
  pseudo-label (dynamic shape). Here: per-class uniform scores are ranked among
  present classes and the lowest floor(n_present/2) are selected — identical
  distribution, fixed (C,) shape.
- DepthMix ("depthcomp"): per-pair foreground comparison with margin and
  foreground threshold (train.py:585-604), generalized from the reference's
  hard-coded batch_size==2 to any even pairing.
- depth / depthhist threshold masks: the reference's host-side histogram scan
  (train.py:616-636) becomes an on-device 100-bin histogram + argmax scans.
- mix(): convex combination with the next sample in the batch (roll by 1),
  reference loader/transformsgpu.py:33-47.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def mix(mask: jnp.ndarray, data: Optional[jnp.ndarray] = None, target: Optional[jnp.ndarray] = None):
    """Blend each sample with the next one in the batch under `mask`.

    mask: (N, H, W) in {0,1} (or fractional). data: (N, H, W, C). target:
    (N, H, W, C) soft labels. Reference loader/transformsgpu.py:33-47 (the
    `mask.shape[0] == data.shape[0]` path used by the trainer).
    """
    def _blend(x):
        m = mask[..., None].astype(x.dtype)
        other = jnp.roll(x, shift=-1, axis=0)
        return m * x + (1.0 - m) * other

    return (
        _blend(data) if data is not None else None,
        _blend(target) if target is not None else None,
    )


def generate_class_mask(key: jax.Array, argmax_label: jnp.ndarray, num_classes: int,
                        ignore_index: int = 250) -> jnp.ndarray:
    """ClassMix mask: 1 where the pixel's class is among a random half of the
    classes present in the (pseudo-)label. (N, H, W) int -> (N, H, W) float.

    Fixed-shape reformulation of reference train.py:573-584 +
    loader/transformmasks.py:27-30: for each sample, draw one uniform score per
    class, restrict to present classes, select the floor(n_present/2) smallest.
    """
    n = argmax_label.shape[0]
    onehot_counts = jax.nn.one_hot(
        jnp.where(argmax_label == ignore_index, num_classes, argmax_label), num_classes + 1
    ).sum(axis=(1, 2))[:, :num_classes]
    present = onehot_counts > 0  # (N, C)
    n_present = jnp.sum(present, axis=1)  # (N,)
    k = (n_present - n_present % 2) // 2  # floor(n/2) of an even count

    scores = jax.random.uniform(key, (n, num_classes))
    scores = jnp.where(present, scores, jnp.inf)
    order = jnp.argsort(scores, axis=1)
    ranks = jnp.argsort(order, axis=1)  # rank of each class among sorted scores
    selected = ranks < k[:, None]  # (N, C) bool

    # per-pixel lookup as a one-hot contraction over the small class axis —
    # a 2M-index take_along_axis is a ~15 ms HBM gather on TPU, the masked
    # reduction fuses for free
    onehot_px = argmax_label[..., None] == jnp.arange(num_classes)  # (N,H,W,C)
    sel_of_pixel = jnp.any(onehot_px & selected[:, None, None, :], axis=-1)
    sel_of_pixel = jnp.where(argmax_label == ignore_index, False, sel_of_pixel)
    return sel_of_pixel.astype(jnp.float32)


def generate_depth_mask(depth: jnp.ndarray, t_low: jnp.ndarray, t_high: jnp.ndarray | None = None) -> jnp.ndarray:
    """Threshold (or band) mask on depth. Reference loader/transformmasks.py:33-41."""
    if t_high is None:
        return (depth >= t_low).astype(jnp.float32)
    lo = jnp.minimum(t_low, t_high)
    hi = jnp.maximum(t_low, t_high)
    return jnp.logical_and(depth >= lo, depth <= hi).astype(jnp.float32)


def generate_depthcomp_mask(
    disps: jnp.ndarray,
    key: jax.Array,
    margin: float,
    foreground_threshold,
) -> jnp.ndarray:
    """DepthMix foreground-comparison mask.

    disps: (N, H, W) normalized disparity; each sample is compared against its
    mix partner (next in batch, matching `mix`'s roll-by-1 pairing; the
    reference hard-codes batch 2 with pairs (0,1),(1,0), train.py:585-604 —
    identical for N=2, generalized otherwise).
    foreground_threshold: float or (low, high) tuple for a per-batch random draw.
    """
    other = jnp.roll(disps, shift=-1, axis=0)
    fg = (disps >= other - margin).astype(jnp.float32)
    if isinstance(foreground_threshold, (tuple, list)):
        ft_l, ft_u = foreground_threshold
        ft = jax.random.uniform(key, (), minval=ft_l, maxval=ft_u)
    else:
        ft = jnp.asarray(foreground_threshold, dtype=jnp.float32)
    fg = fg * (disps >= ft).astype(jnp.float32)
    return fg


def _first_index_where(cond: jnp.ndarray, default: jnp.ndarray) -> jnp.ndarray:
    """Index of first True along axis 0, or `default` if none."""
    any_true = jnp.any(cond)
    idx = jnp.argmax(cond)
    return jnp.where(any_true, idx, default)


def depthhist_thresholds(depth: jnp.ndarray, key: jax.Array, bins: int = 100) -> jnp.ndarray:
    """Per-sample random threshold from the log-depth histogram.

    On-device reformulation of reference train.py:616-631: build a density
    histogram of log(1+depth) with 100 bins over [min, max]; max_depth = the
    first bin edge from the top (skipping the topmost) whose density > 1.5;
    min_depth = first edge where the cdf > 0.4; threshold ~ U(min, max).
    depth: (N, H, W) -> (N,) thresholds in depth units matching `depth`.
    """
    n = depth.shape[0]
    logd = jnp.log1p(depth.reshape(n, -1))
    dmin = jnp.min(logd, axis=1, keepdims=True)
    dmax = jnp.max(logd, axis=1, keepdims=True)
    width = (dmax - dmin) / bins + 1e-12
    edges = dmin + width * jnp.arange(bins + 1)[None, :]  # (N, bins+1)

    bin_idx = jnp.clip(((logd - dmin) / width).astype(jnp.int32), 0, bins - 1)
    # histogram via compare+reduce (a 262k-element scatter-add serializes on
    # TPU; the broadcast compare streams at full bandwidth)
    counts = jnp.sum(
        (bin_idx[:, :, None] == jnp.arange(bins)[None, None, :]).astype(jnp.float32),
        axis=1,
    )
    density = counts / (jnp.sum(counts, axis=1, keepdims=True) * width)

    def per_sample(dens, edge):
        # np.flip(hist)[1:] pairs density[bins-2-i] with edge np.flip(bin_edges)[1:][i] = edge[bins-1-i]
        rev_d = dens[::-1][1:]           # density from top, skipping topmost bin
        rev_e = edge[::-1][1:-1]         # corresponding upper edges
        hi_idx = _first_index_where(rev_d > 1.5, jnp.asarray(0))
        max_e = rev_e[hi_idx]
        cdf = jnp.cumsum(dens) / jnp.sum(dens)
        lo_idx = _first_index_where(cdf > 0.4, jnp.asarray(0))
        min_e = edge[lo_idx]
        return min_e, max_e

    min_e, max_e = jax.vmap(per_sample)(density, edges)
    u = jax.random.uniform(key, (n,))
    thr_log = u * (max_e - min_e) + min_e
    return jnp.expm1(thr_log)
