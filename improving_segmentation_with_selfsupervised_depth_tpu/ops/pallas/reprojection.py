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


# ---------------------------------------------------------------------------
# Analytic backward: d(error)/d(pred) for the differentiated reprojection path
# ---------------------------------------------------------------------------
#
# e_c = [0.85*clip((1-S)/2, 0, 1) + 0.15*|y-x|]/C with S the 3x3 mean-filter
# SSIM. With window stats ux, uy, vx, vy, vxy and A1 = 2*ux*uy+C1,
# A2 = 2*vxy+C2, B1 = ux^2+uy^2+C1, B2 = vx+vy+C2, S = A1*A2/(B1*B2):
#
#   dS/dux  = 2*A2*(uy*B1 - ux*A1)/(B1^2*B2)
#   dS/dvx  = -A1*A2/(B1*B2^2)
#   dS/dvxy = 2*A1/(B1*B2)
#   dx(q)   = (1/9) * sum_{windows w containing q}
#               [P1 + 2*x_q*P2 - 2*(P2*ux) + y_q*P3 - (P3*uy)](w)
# with P_i = G * de/dS * dS/d(stat) — i.e. five 3x3 box filters over
# elementwise coefficient planes, the same banded window-sum structure as the
# forward. The kernel emits dxp on the reflect-PADDED grid; the cheap
# reflect-fold, interior slice and the pointwise L1 term happen in XLA.


def _reproj_bwd_kernel(xp_hbm, yp_hbm, gp_hbm, out_ref, xb, yb, gb, sems,
                       *, n_channels: int, band: int, h: int, w: int):
    n_i = pl.program_id(0)
    band_j = pl.program_id(1)
    ci = pl.program_id(2)
    plane = n_i * n_channels + ci
    r0 = band_j * band  # dxp row start on the (h+2)-row padded grid

    cp_x = pltpu.make_async_copy(xp_hbm.at[plane, pl.ds(r0, band + 16)], xb, sems.at[0])
    cp_y = pltpu.make_async_copy(yp_hbm.at[plane, pl.ds(r0, band + 16)], yb, sems.at[1])
    cp_g = pltpu.make_async_copy(gp_hbm.at[n_i, pl.ds(r0, band + 16)], gb, sems.at[2])
    cp_x.start(); cp_y.start(); cp_g.start()
    cp_x.wait(); cp_y.wait(); cp_g.wait()

    # buffer row t holds (shifted) padded-grid row r0 + t - 8; columns carry a
    # 2-lane left margin so the center grid extends 2 cols past each image
    # edge (those centers are zero-masked) — the final box filter is then a
    # plain window sum with no in-kernel lane shifting (Mosaic can't offset
    # lanes in pads/concats).
    nc = band + 2  # center rows needed: [r0-2, r0+band)
    x_st = xb[6:6 + nc + 2, : w + 6].astype(jnp.float32)  # xp rows [r0-2, r0+band+2)
    y_st = yb[6:6 + nc + 2, : w + 6].astype(jnp.float32)
    g_ct = gb[6:6 + nc, : w + 4].astype(jnp.float32)      # G at centers [r0-2, r0+band)

    mu_x = _window_sum9(x_st) / 9.0    # (nc, w+4): center cols [-2, w+2)
    mu_y = _window_sum9(y_st) / 9.0
    vx = _window_sum9(x_st * x_st) / 9.0 - mu_x * mu_x
    vy = _window_sum9(y_st * y_st) / 9.0 - mu_y * mu_y
    vxy = _window_sum9(x_st * y_st) / 9.0 - mu_x * mu_y

    a1 = 2.0 * mu_x * mu_y + _C1
    a2 = 2.0 * vxy + _C2
    b1 = mu_x * mu_x + mu_y * mu_y + _C1
    b2 = vx + vy + _C2
    s = (a1 * a2) / (b1 * b2)
    inner = (1.0 - s) * 0.5
    # clip subgradient matching jnp.clip: 1 strictly inside, 0.5 at an exact
    # bound (JAX splits max/min gradients at ties), 0 outside. Exact bounds
    # occur in practice: identical windows give S == 1 -> inner == 0.
    live = (((inner > 0.0) & (inner < 1.0)).astype(jnp.float32)
            + 0.5 * ((inner == 0.0) | (inner == 1.0)).astype(jnp.float32))
    # zero centers outside the image (rows beyond the band's valid range and
    # the 2-col horizontal margins)
    crow = jax.lax.broadcasted_iota(jnp.int32, (nc, w + 4), 0) + (r0 - 2)
    ccol = jax.lax.broadcasted_iota(jnp.int32, (nc, w + 4), 1) - 2
    live = live * ((crow >= 0) & (crow < h)
                   & (ccol >= 0) & (ccol < w)).astype(jnp.float32)

    e = g_ct * (-0.85 / (2.0 * n_channels)) * live
    p1 = e * (2.0 * a2 * (mu_y * b1 - mu_x * a1) / (b1 * b1 * b2))
    p2 = e * (-(a1 * a2) / (b1 * b2 * b2))
    p3 = e * (2.0 * a1 / (b1 * b2))
    p2u = p2 * mu_x
    p3u = p3 * mu_y

    # box-filter the coefficient planes onto the padded grid: dxp col j sums
    # center cols [j-2, j], which with the 2-col margin is the plain window sum
    b_p1 = _window_sum9(p1)    # (band, w+2)
    b_p2 = _window_sum9(p2)
    b_p2u = _window_sum9(p2u)
    b_p3 = _window_sum9(p3)
    b_p3u = _window_sum9(p3u)

    xq = xb[8:8 + band, 2: w + 4].astype(jnp.float32)  # xp rows [r0, r0+band)
    yq = yb[8:8 + band, 2: w + 4].astype(jnp.float32)
    out_ref[0, 0] = (b_p1 + 2.0 * xq * b_p2 - 2.0 * b_p2u
                     + yq * b_p3 - b_p3u) / 9.0


@functools.partial(jax.jit, static_argnames=("interpret", "band"))
def fused_reprojection_error_grad(pred: jnp.ndarray, target: jnp.ndarray,
                                  g: jnp.ndarray, interpret: bool = False,
                                  band: int = 8) -> jnp.ndarray:
    """d/d(pred) of sum(g * fused_reprojection_error(pred, target)).

    pred/target (N, H, W, C), g (N, H, W, 1) -> (N, H, W, C) float32.
    """
    n, h, w, c = pred.shape
    while h % band:
        band //= 2
    band = max(band, 1)
    h2 = h + 2
    n_bands = -(-h2 // band)
    rows_needed = (n_bands - 1) * band + band + 16  # top shift 8 + fetch band+16
    w_pad = -(-(w + 4) // 128) * 128

    def prep(x):
        x = jnp.pad(x.astype(jnp.float32),
                    [(0, 0), (1, 1), (1, 1), (0, 0)], mode="reflect")
        # top shift 8 (aligned band DMA), left margin 2 (edge-center columns)
        x = jnp.pad(x, [(0, 0), (8, rows_needed - 8 - h2), (2, w_pad - (w + 4)), (0, 0)])
        return x.transpose(0, 3, 1, 2).reshape(n * c, rows_needed, w_pad)

    xp = prep(pred)
    yp = prep(target)
    gp = jnp.pad(g[..., 0].astype(jnp.float32),
                 [(0, 0), (8, rows_needed - 8 - h), (2, w_pad - w - 2)])

    dxp = pl.pallas_call(
        functools.partial(_reproj_bwd_kernel, n_channels=c, band=band, h=h, w=w),
        out_shape=jax.ShapeDtypeStruct((n, c, n_bands * band, w + 2), jnp.float32),
        grid=(n, n_bands, c),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1, band, w + 2), lambda i, j, k: (i, k, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((band + 16, w_pad), jnp.float32),
            pltpu.VMEM((band + 16, w_pad), jnp.float32),
            pltpu.VMEM((band + 16, w_pad), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(xp, yp, gp)

    dxp = dxp[:, :, :h2, :].transpose(0, 2, 3, 1)  # (N, h+2, w+2, C)
    # reflect-pad backward: fold the padded border rows/cols onto their sources
    dxp = dxp.at[:, :, 2].add(dxp[:, :, 0])
    dxp = dxp.at[:, :, w - 1].add(dxp[:, :, w + 1])
    dxp = dxp.at[:, 2].add(dxp[:, 0])
    dxp = dxp.at[:, h - 1].add(dxp[:, h + 1])
    dx = dxp[:, 1:h + 1, 1:w + 1]
    # pointwise L1 term; JAX's |u| subgradient at 0 is +1 (lax.abs uses
    # select(u >= 0, ...)) — match the XLA autodiff path exactly
    u = target.astype(jnp.float32) - pred.astype(jnp.float32)
    dx = dx + g * (0.15 / c) * (-jnp.where(u >= 0, 1.0, -1.0))
    return dx


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def fused_reprojection_error_diff(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Differentiable fused SSIM+L1 reprojection error (gradient w.r.t. pred;
    target is treated as data, matching the photometric loss where the target
    frame is a network input, reference loss/monodepth_loss.py:104-116)."""
    return fused_reprojection_error(pred, target)


def _frd_fwd(pred, target):
    return fused_reprojection_error(pred, target), (pred, target)


def _frd_bwd(res, g):
    pred, target = res
    dpred = fused_reprojection_error_grad(pred, target, g)
    return dpred.astype(pred.dtype), jnp.zeros_like(target)


fused_reprojection_error_diff.defvjp(_frd_fwd, _frd_bwd)
