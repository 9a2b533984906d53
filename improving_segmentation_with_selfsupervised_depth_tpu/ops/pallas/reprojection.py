"""Fused SSIM+L1 reprojection error — banded Pallas TPU kernel.

The reference formulation (loss/monodepth_loss.py:104-116 + SSIM at
models/monodepth_layers.py:224-254) chains reflection pad, five 3x3 average
pools and a dozen elementwise ops — each a full-resolution HBM round trip when
left to XLA. This kernel computes the whole per-pixel error

    0.85 * mean_c(clip((1-SSIM)/2, 0, 1)) + 0.15 * mean_c(|target - pred|)

in one read of the inputs and one write of the output.

Design (VMEM-bounded): inputs stay in HBM (`memory_space=ANY`); the kernel
DMAs one (BAND+2, W+2) row band per grid step — the +2 halo rows give the 3x3
windows without overlapping BlockSpecs. Grid is (N, H/BAND, C) with the
channel axis innermost so the channel mean accumulates into the revisited
output block.
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
    """Sum over the 3x3 neighbourhood; x is (B+2, W+2), returns (B, W)."""
    h2, w2 = x.shape
    h, w = h2 - 2, w2 - 2
    acc = jnp.zeros((h, w), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            acc = acc + x[dy : dy + h, dx : dx + w]
    return acc


def _reproj_kernel(pred_hbm, target_hbm, out_ref, xb, yb, sems,
                   *, n_channels: int, band: int):
    n_i = pl.program_id(0)
    band_j = pl.program_id(1)
    ci = pl.program_id(2)
    plane = n_i * n_channels + ci
    row0 = band_j * band

    # DMA row slices must be 8-aligned in the sublane dim: fetch band+8 rows
    # (the array is bottom-padded accordingly) and use the first band+2.
    cp_x = pltpu.make_async_copy(
        pred_hbm.at[plane, pl.ds(row0, band + 8)], xb, sems.at[0])
    cp_y = pltpu.make_async_copy(
        target_hbm.at[plane, pl.ds(row0, band + 8)], yb, sems.at[1])
    cp_x.start()
    cp_y.start()
    cp_x.wait()
    cp_y.wait()

    w = out_ref.shape[2]
    x = xb[: band + 2, : w + 2].astype(jnp.float32)
    y = yb[: band + 2, : w + 2].astype(jnp.float32)
    h = band

    mu_x = _window_sum9(x) / 9.0
    mu_y = _window_sum9(y) / 9.0
    sig_x = _window_sum9(x * x) / 9.0 - mu_x * mu_x
    sig_y = _window_sum9(y * y) / 9.0 - mu_y * mu_y
    sig_xy = _window_sum9(x * y) / 9.0 - mu_x * mu_y

    ssim_n = (2.0 * mu_x * mu_y + _C1) * (2.0 * sig_xy + _C2)
    ssim_d = (mu_x * mu_x + mu_y * mu_y + _C1) * (sig_x + sig_y + _C2)
    ssim_term = jnp.clip((1.0 - ssim_n / ssim_d) * 0.5, 0.0, 1.0)

    l1 = jnp.abs(y[1 : 1 + h, 1 : 1 + w] - x[1 : 1 + h, 1 : 1 + w])
    contrib = (0.85 * ssim_term + 0.15 * l1) / n_channels

    @pl.when(ci == 0)
    def _():
        out_ref[0] = contrib

    @pl.when(ci > 0)
    def _():
        out_ref[0] = out_ref[0] + contrib


@functools.partial(jax.jit, static_argnames=("interpret", "band"))
def fused_reprojection_error(pred: jnp.ndarray, target: jnp.ndarray,
                             interpret: bool = False, band: int = 128) -> jnp.ndarray:
    """Per-pixel 0.85*SSIM + 0.15*L1 error, channel-averaged.

    pred/target: (N, H, W, C) -> (N, H, W, 1). Matches
    ops.photometric.reprojection_loss numerics. H must be divisible by `band`
    (band shrinks automatically otherwise).
    """
    n, h, w, c = pred.shape
    while h % band:
        band //= 2
    band = max(band, 1)

    # DMA tiling: rows 8-aligned, lanes 128-aligned
    w_pad = -(-(w + 2) // 128) * 128

    def prep(x):
        x = jnp.pad(x.astype(jnp.float32),
                    [(0, 0), (1, 1), (1, 1), (0, 0)], mode="reflect")
        # extra bottom rows / right lanes so every DMA stays aligned+in bounds
        x = jnp.pad(x, [(0, 0), (0, 6), (0, w_pad - (w + 2)), (0, 0)])
        return x.transpose(0, 3, 1, 2).reshape(n * c, h + 8, w_pad)

    pred_p = prep(pred)
    target_p = prep(target)

    out = pl.pallas_call(
        functools.partial(_reproj_kernel, n_channels=c, band=band),
        out_shape=jax.ShapeDtypeStruct((n, h, w), jnp.float32),
        grid=(n, h // band, c),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, band, w), lambda i, j, k: (i, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((band + 8, w_pad), jnp.float32),
            pltpu.VMEM((band + 8, w_pad), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(pred_p, target_p)
    return out[..., None]
