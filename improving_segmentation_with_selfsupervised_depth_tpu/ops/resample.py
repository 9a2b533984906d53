"""Differentiable image warping: `grid_sample` with PyTorch semantics.

This is the numerically most sensitive op of the SDE pipeline (the photometric
loss warps source frames through predicted depth+pose, reference
loss/monodepth_loss.py:94-98 uses `F.grid_sample(padding_mode="border",
align_corners=True)`).

TPU-first design: one fused 4-corner gather per image expressed with
`take_along_axis` over a flattened spatial axis. XLA lowers this to a dynamic
gather that pipelines well from HBM; the bilinear weights stay fused with the
gather consumers. Gradients flow to the sampling grid through the corner
weights (same subgradient as torch) and to the image through scatter-add.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _corners_and_weights(img, grid, align_corners):
    n, h, w, c = img.shape
    gn, gh, gw, two = grid.shape
    assert two == 2 and gn == n, (img.shape, grid.shape)

    gx = grid[..., 0].astype(jnp.float32)
    gy = grid[..., 1].astype(jnp.float32)
    if align_corners:
        ix = (gx + 1.0) * 0.5 * (w - 1)
        iy = (gy + 1.0) * 0.5 * (h - 1)
    else:
        ix = ((gx + 1.0) * w - 1.0) * 0.5
        iy = ((gy + 1.0) * h - 1.0) * 0.5
    ix = jnp.clip(ix, -1.0, float(w))
    iy = jnp.clip(iy, -1.0, float(h))

    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    fx = ix - x0
    fy = iy - y0

    x0c = jnp.clip(x0, 0, w - 1).astype(jnp.int32)
    x1c = jnp.clip(x0 + 1, 0, w - 1).astype(jnp.int32)
    y0c = jnp.clip(y0, 0, h - 1).astype(jnp.int32)
    y1c = jnp.clip(y0 + 1, 0, h - 1).astype(jnp.int32)

    flat = img.reshape(n, h * w, c)

    def gather(yi, xi):
        idx = (yi * w + xi).reshape(n, gh * gw, 1)
        return jnp.take_along_axis(flat, idx, axis=1).reshape(n, gh, gw, c)

    g00 = gather(y0c, x0c)
    g01 = gather(y0c, x1c)
    g10 = gather(y1c, x0c)
    g11 = gather(y1c, x1c)
    return (g00, g01, g10, g11), (fx, fy), (w, h)


def _blend(corners, fx, fy, dtype):
    g00, g01, g10, g11 = corners
    w00 = ((1.0 - fx) * (1.0 - fy))[..., None]
    w01 = (fx * (1.0 - fy))[..., None]
    w10 = ((1.0 - fx) * fy)[..., None]
    w11 = (fx * fy)[..., None]
    return (w00 * g00 + w01 * g01 + w10 * g10 + w11 * g11).astype(dtype)


def _use_pallas_warp(img, grid) -> bool:
    n, h, w, c = img.shape
    return (jax.default_backend() == "tpu"
            and grid.shape[1:3] == (h, w)
            and h % 8 == 0 and w % 128 == 0)


def _warp_with_coeffs(img, grid):
    """Forward warp + the two grid-gradient coefficient planes.

    dfx = (g01-g00)(1-fy) + (g11-g10)fy,  dfy = (g10-g00)(1-fx) + (g11-g01)fx
    — exactly d(out)/d(ix), d(out)/d(iy), so the VJP below is elementwise.
    On TPU this runs the Pallas lane-shuffle kernel (ops/pallas/warp.py):
    XLA's generic gather costs ~60 ms per 512x512x8x3 warp (~7 ns/index,
    tools/bench_gather2.py) and dominated the train step; the kernel does the
    same fetch in ~10 ms, bit-exact.
    """
    if _use_pallas_warp(img, grid):
        from .pallas.warp import bilinear_warp_corners, unnormalize_grid

        h, w = img.shape[1:3]
        ix, iy = unnormalize_grid(grid, h, w)
        out, dfx, dfy = bilinear_warp_corners(img, ix, iy)
        return out.astype(img.dtype), dfx, dfy
    corners, (fx, fy), _ = _corners_and_weights(img, grid, True)
    g00, g01, g10, g11 = (g.astype(jnp.float32) for g in corners)
    out = _blend(corners, fx, fy, img.dtype)
    dfx = (g01 - g00) * (1.0 - fy)[..., None] + (g11 - g10) * fy[..., None]
    dfy = (g10 - g00) * (1.0 - fx)[..., None] + (g11 - g01) * fx[..., None]
    return out, dfx, dfy


@jax.custom_vjp
def grid_sample_nograd_image(img: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """grid_sample (border, align_corners=True) that treats `img` as data.

    Photometric-loss fast path: the warped sources are input frames (never
    differentiated), so the backward pass needs gradients w.r.t. the *grid*
    only. The custom VJP saves the two gradient coefficient planes from the
    forward and makes the backward purely elementwise — no re-gather and no
    scatter-add on TPU. The img cotangent is zero by contract (enforced by
    the caller).
    """
    if _use_pallas_warp(img, grid):
        from .pallas.warp import bilinear_warp_corners, unnormalize_grid

        h, w = img.shape[1:3]
        ix, iy = unnormalize_grid(grid, h, w)
        return bilinear_warp_corners(img, ix, iy)[0].astype(img.dtype)
    corners, (fx, fy), _ = _corners_and_weights(img, grid, True)
    return _blend(corners, fx, fy, img.dtype)


def _gs_fwd(img, grid):
    out, dfx, dfy = _warp_with_coeffs(img, grid)
    n, h, w, c = img.shape
    dtype_token = jnp.zeros((0,), img.dtype)  # residuals must be JAX types
    return out, (dfx, dfy, w, h, img.shape, dtype_token)


def _gs_bwd(res, ct):
    dfx, dfy, w, h, img_shape, dtype_token = res
    img_dtype = dtype_token.dtype
    ct = ct.astype(jnp.float32)
    # Where corner indices were clamped (border), the coefficient planes are
    # zero, reproducing torch's border subgradient.
    dgx = jnp.sum(ct * dfx, axis=-1) * (0.5 * (w - 1))
    dgy = jnp.sum(ct * dfy, axis=-1) * (0.5 * (h - 1))
    dgrid = jnp.stack([dgx, dgy], axis=-1).astype(jnp.float32)
    # image is data by contract; the zero cotangent is DCE'd by XLA because
    # callers stop_gradient the image argument
    return jnp.zeros(img_shape, img_dtype), dgrid


grid_sample_nograd_image.defvjp(_gs_fwd, _gs_bwd)


def grid_sample(img: jnp.ndarray, grid: jnp.ndarray, align_corners: bool = True) -> jnp.ndarray:
    """Bilinear sampling of `img` (N, H, W, C) at `grid` (N, Hg, Wg, 2).

    grid[..., 0] is x in [-1, 1], grid[..., 1] is y in [-1, 1]
    (same convention as torch.nn.functional.grid_sample).
    Padding mode is 'border' (out-of-range samples clamp to the edge).
    """
    n, h, w, c = img.shape
    gn, gh, gw, two = grid.shape
    assert two == 2 and gn == n, (img.shape, grid.shape)

    gx = grid[..., 0].astype(jnp.float32)
    gy = grid[..., 1].astype(jnp.float32)
    if align_corners:
        ix = (gx + 1.0) * 0.5 * (w - 1)
        iy = (gy + 1.0) * 0.5 * (h - 1)
    else:
        ix = ((gx + 1.0) * w - 1.0) * 0.5
        iy = ((gy + 1.0) * h - 1.0) * 0.5

    # Keep the *fractional* weights from the unclamped coordinate (torch
    # 'border' semantics), clamp only the gather indices. Guard against
    # inf/nan coordinates so floor() stays in int range.
    ix = jnp.clip(ix, -1.0, float(w))
    iy = jnp.clip(iy, -1.0, float(h))

    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    fx = ix - x0
    fy = iy - y0

    x0c = jnp.clip(x0, 0, w - 1).astype(jnp.int32)
    x1c = jnp.clip(x0 + 1, 0, w - 1).astype(jnp.int32)
    y0c = jnp.clip(y0, 0, h - 1).astype(jnp.int32)
    y1c = jnp.clip(y0 + 1, 0, h - 1).astype(jnp.int32)

    flat = img.reshape(n, h * w, c)

    def gather(yi, xi):
        idx = (yi * w + xi).reshape(n, gh * gw, 1)
        return jnp.take_along_axis(flat, idx, axis=1).reshape(n, gh, gw, c)

    w00 = ((1.0 - fx) * (1.0 - fy))[..., None]
    w01 = (fx * (1.0 - fy))[..., None]
    w10 = ((1.0 - fx) * fy)[..., None]
    w11 = (fx * fy)[..., None]

    out = (
        w00 * gather(y0c, x0c)
        + w01 * gather(y0c, x1c)
        + w10 * gather(y1c, x0c)
        + w11 * gather(y1c, x1c)
    )
    return out.astype(img.dtype)
