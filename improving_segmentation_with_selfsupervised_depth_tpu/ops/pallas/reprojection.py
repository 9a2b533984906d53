"""Fused SSIM+L1 reprojection error — one VMEM pass per (pred, target) pair.

The reference formulation (loss/monodepth_loss.py:104-116 + SSIM at
models/monodepth_layers.py:224-254) chains reflection pad, five 3x3 average
pools and a dozen elementwise ops — each a full-resolution HBM round trip when
left to XLA. This kernel computes the whole per-pixel error

    0.85 * mean_c(clip((1-SSIM)/2, 0, 1)) + 0.15 * mean_c(|target - pred|)

in a single pass over VMEM-resident rows.

Layout trick: channels are folded into the *sublane* dimension ((N*C*H, W)
view) so the 128-lane axis stays the image width; the 3x3 windows are computed
with static shifted slices of a (rows+2)-halo block, not reduce_window.

Grid: one program per (batch*channel) image plane; H,W up to VMEM limits
(512x512 f32 x ~8 temporaries ~ 8MB). Returns the channel-averaged map (N,H,W).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_C1 = 0.01**2
_C2 = 0.03**2


def _window_sum9(x):
    """Sum over the 3x3 neighbourhood; x is (H+2, W+2), returns (H, W)."""
    h2, w2 = x.shape
    h, w = h2 - 2, w2 - 2
    acc = jnp.zeros((h, w), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            acc = acc + x[dy : dy + h, dx : dx + w]
    return acc


def _reproj_kernel(pred_ref, target_ref, out_ref, *, n_channels: int):
    # refs: pred/target (C, H+2, W+2) reflect-padded planes of ONE batch item;
    # out (H, W) accumulates the channel mean of the fused error.
    c = n_channels
    hp = pred_ref.shape[2]
    wp = pred_ref.shape[3]
    h, w = hp - 2, wp - 2

    acc = jnp.zeros((h, w), jnp.float32)
    for ci in range(c):
        x = pred_ref[0, ci].astype(jnp.float32)
        y = target_ref[0, ci].astype(jnp.float32)

        mu_x = _window_sum9(x) / 9.0
        mu_y = _window_sum9(y) / 9.0
        sig_x = _window_sum9(x * x) / 9.0 - mu_x * mu_x
        sig_y = _window_sum9(y * y) / 9.0 - mu_y * mu_y
        sig_xy = _window_sum9(x * y) / 9.0 - mu_x * mu_y

        ssim_n = (2.0 * mu_x * mu_y + _C1) * (2.0 * sig_xy + _C2)
        ssim_d = (mu_x * mu_x + mu_y * mu_y + _C1) * (sig_x + sig_y + _C2)
        ssim_term = jnp.clip((1.0 - ssim_n / ssim_d) * 0.5, 0.0, 1.0)

        l1 = jnp.abs(y[1 : 1 + h, 1 : 1 + w] - x[1 : 1 + h, 1 : 1 + w])
        acc = acc + 0.85 * ssim_term + 0.15 * l1
    out_ref[0] = acc / c


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_reprojection_error(pred: jnp.ndarray, target: jnp.ndarray,
                             interpret: bool = False) -> jnp.ndarray:
    """Per-pixel 0.85*SSIM + 0.15*L1 error, channel-averaged.

    pred/target: (N, H, W, C) -> (N, H, W, 1). Matches
    ops.photometric.reprojection_loss numerics.
    """
    n, h, w, c = pred.shape
    # reflect-pad once on the host graph (cheap, fusable), channels-first planes
    def prep(x):
        x = jnp.pad(x.astype(jnp.float32),
                    [(0, 0), (1, 1), (1, 1), (0, 0)], mode="reflect")
        return x.transpose(0, 3, 1, 2)  # (N, C, H+2, W+2)

    pred_p = prep(pred)
    target_p = prep(target)

    out = pl.pallas_call(
        functools.partial(_reproj_kernel, n_channels=c),
        out_shape=jax.ShapeDtypeStruct((n, h, w), jnp.float32),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, c, h + 2, w + 2), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, h + 2, w + 2), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(pred_p, target_p)
    return out[..., None]
