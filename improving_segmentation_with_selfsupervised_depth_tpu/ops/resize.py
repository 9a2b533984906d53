"""Bilinear / nearest resize with exact PyTorch `F.interpolate` semantics.

TPU-first design: a separable bilinear resize is expressed as two dense
matmuls (H_out x H_in) @ img @ (W_in x W_out) so it tiles onto the MXU instead
of degenerating into gathers. The interpolation-weight matrices are built from
static shapes at trace time and constant-folded by XLA.

Semantics matched against the reference usages:
- `align_corners=False` bilinear: reference loss/monodepth_loss.py:72-73 (disp
  upsample), models/joint_segmentation_depth_decoder.py:64-73 (logit resize).
- `align_corners=True` bilinear: reference loss/loss.py:23 (label upsampling in
  cross_entropy2d).
- nearest: reference models/monodepth_layers.py:202-205 (decoder upsample).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _linear_weight_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """(out_size, in_size) row-stochastic bilinear interpolation matrix."""
    if in_size == out_size:
        return np.eye(out_size, dtype=np.float32)
    if align_corners:
        if out_size == 1:
            src = np.zeros((1,), dtype=np.float64)
        else:
            src = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    else:
        src = (np.arange(out_size, dtype=np.float64) + 0.5) * in_size / out_size - 0.5
    x0 = np.floor(src)
    frac = src - x0
    x0c = np.clip(x0, 0, in_size - 1).astype(np.int64)
    x1c = np.clip(x0 + 1, 0, in_size - 1).astype(np.int64)
    w = np.zeros((out_size, in_size), dtype=np.float64)
    rows = np.arange(out_size)
    np.add.at(w, (rows, x0c), 1.0 - frac)
    np.add.at(w, (rows, x1c), frac)
    return w.astype(np.float32)


def resize_bilinear(x: jnp.ndarray, out_hw, align_corners: bool = False) -> jnp.ndarray:
    """Bilinear resize of NHWC (or NHW) tensor to `out_hw = (H_out, W_out)`.

    Matches torch.nn.functional.interpolate(mode='bilinear') exactly for both
    align_corners settings (no antialiasing).
    """
    out_h, out_w = int(out_hw[0]), int(out_hw[1])
    squeeze = x.ndim == 3
    if squeeze:
        x = x[..., None]
    n, h, w, c = x.shape
    if (h, w) == (out_h, out_w):
        return x[..., 0] if squeeze else x
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    if h != out_h:
        wh = jnp.asarray(_linear_weight_matrix(h, out_h, align_corners))
        xf = jnp.einsum("oh,nhwc->nowc", wh, xf)
    if w != out_w:
        ww = jnp.asarray(_linear_weight_matrix(w, out_w, align_corners))
        xf = jnp.einsum("pw,nhwc->nhpc", ww, xf)
    xf = xf.astype(dtype)
    return xf[..., 0] if squeeze else xf


@functools.lru_cache(maxsize=None)
def _nearest_index(in_size: int, out_size: int) -> np.ndarray:
    # torch 'nearest': src = floor(dst * in/out)
    idx = np.floor(np.arange(out_size, dtype=np.float64) * in_size / out_size)
    return np.clip(idx, 0, in_size - 1).astype(np.int32)


def resize_nearest(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """Nearest resize of NHWC (or NHW) tensor, torch 'nearest' semantics."""
    out_h, out_w = int(out_hw[0]), int(out_hw[1])
    squeeze = x.ndim == 3
    if squeeze:
        x = x[..., None]
    n, h, w, c = x.shape
    if (h, w) != (out_h, out_w):
        if h != out_h:
            x = jnp.take(x, jnp.asarray(_nearest_index(h, out_h)), axis=1)
        if w != out_w:
            x = jnp.take(x, jnp.asarray(_nearest_index(w, out_w)), axis=2)
    return x[..., 0] if squeeze else x


def upsample2x_nearest(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest x2 upsample (reference models/monodepth_layers.py:202-205).

    Implemented as a pure reshape/broadcast — no gather, free on TPU.
    """
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, 2 * h, 2 * w, c)
