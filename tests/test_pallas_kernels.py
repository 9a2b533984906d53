"""Pallas kernel numerics (interpret mode on CPU; compiled path covered on TPU
by bench/eval)."""

import jax.numpy as jnp
import numpy as np
import pytest

from improving_segmentation_with_selfsupervised_depth_tpu.ops.pallas.reprojection import (
    fused_reprojection_error,
)
from improving_segmentation_with_selfsupervised_depth_tpu.ops.photometric import (
    reprojection_loss,
)


@pytest.mark.parametrize("shape,band", [((2, 16, 24, 3), 8), ((1, 32, 40, 3), 16),
                                        ((2, 24, 24, 1), 8)])
def test_fused_reprojection_matches_reference(shape, band):
    rng = np.random.default_rng(0)
    pred = jnp.asarray(rng.uniform(0, 1, shape).astype(np.float32))
    target = jnp.asarray(rng.uniform(0, 1, shape).astype(np.float32))
    ref = reprojection_loss(pred, target)
    got = fused_reprojection_error(pred, target, interpret=True, band=band)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_fused_reprojection_band_fallback():
    # H=20 not divisible by 8 -> band shrinks automatically
    rng = np.random.default_rng(1)
    pred = jnp.asarray(rng.uniform(0, 1, (1, 20, 24, 3)).astype(np.float32))
    target = jnp.asarray(rng.uniform(0, 1, (1, 20, 24, 3)).astype(np.float32))
    got = fused_reprojection_error(pred, target, interpret=True, band=8)
    ref = reprojection_loss(pred, target)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("H", [16, 32])  # 32 -> 4 bands/program path
def test_warp_kernel_matches_grid_sample(H):
    """Pallas bilinear warp (interpret mode): exact forward + gradient
    coefficient planes vs the XLA reference, including border clamps and
    wildly out-of-range samples."""
    from improving_segmentation_with_selfsupervised_depth_tpu.ops.pallas.warp import (
        bilinear_warp_corners, unnormalize_grid)
    from improving_segmentation_with_selfsupervised_depth_tpu.ops.resample import (
        _corners_and_weights, grid_sample)

    N, W, C = 2, 128, 3
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.uniform(0, 1, (N, H, W, C)).astype(np.float32))
    gy, gx = np.meshgrid(np.linspace(-1, 1, H), np.linspace(-1, 1, W), indexing="ij")
    gx = gx + rng.normal(0, 0.05, (N, H, W))
    gy = gy + rng.normal(0, 0.05, (N, H, W))
    gx[:, :2] += rng.uniform(-3, 3, (N, 2, W))  # border-clamp + full-scan path
    gy[:, -2:] += rng.uniform(-3, 3, (N, 2, W))
    grid = jnp.asarray(np.stack([gx, gy], -1).astype(np.float32))

    ix, iy = unnormalize_grid(grid, H, W)
    out, dfx, dfy = bilinear_warp_corners(img, ix, iy, interpret=True)

    # corners round through bf16 (channel-pair packing, see warp.py docstring;
    # the reference warps in fp16 under AMP) -> tolerance is bf16 epsilon on
    # [0,1] values; an indexing bug would show as O(0.1) errors
    ref = grid_sample(img, grid, align_corners=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-3)

    (g00, g01, g10, g11), (fx, fy), _ = _corners_and_weights(img, grid, True)
    ref_dfx = (g01 - g00) * (1 - fy)[..., None] + (g11 - g10) * fy[..., None]
    ref_dfy = (g10 - g00) * (1 - fx)[..., None] + (g11 - g01) * fx[..., None]
    np.testing.assert_allclose(np.asarray(dfx), np.asarray(ref_dfx), atol=1e-2)
    np.testing.assert_allclose(np.asarray(dfy), np.asarray(ref_dfy), atol=1e-2)

    # exactness of the *indexing* independent of value precision: warp a bf16-
    # representable image and require bit-identical output
    imgq = jnp.asarray(np.asarray(img, np.float32)).astype(jnp.bfloat16).astype(jnp.float32)
    outq, _, _ = bilinear_warp_corners(imgq, ix, iy, interpret=True)
    refq = grid_sample(imgq, grid, align_corners=True)
    np.testing.assert_allclose(np.asarray(outq), np.asarray(refq), atol=1e-6)


def test_fused_reprojection_backward_matches_autodiff():
    """Analytic SSIM+L1 VJP kernel vs jax.grad of the XLA reprojection chain
    (interpret mode), including identical-window regions where the clip and
    |.| subgradient edge cases are live."""
    from improving_segmentation_with_selfsupervised_depth_tpu.ops.pallas.reprojection import (
        fused_reprojection_error_grad)

    rng = np.random.default_rng(0)
    N, H, W, C = 2, 16, 24, 3
    pred = jnp.asarray(rng.uniform(0, 1, (N, H, W, C)).astype(np.float32))
    target = jnp.asarray(rng.uniform(0, 1, (N, H, W, C)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((N, H, W, 1)).astype(np.float32))

    import jax

    for p in (pred, pred.at[:, :8].set(target[:, :8])):
        ref = jax.grad(lambda q: jnp.vdot(g, reprojection_loss(q, target)))(p)
        got = fused_reprojection_error_grad(p, target, g, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4)


def test_warp_kernel_multi_grid_matches_single():
    """bilinear_warp_corners_nchw with reps=2 (the packed photometric form)
    equals two single-grid calls; grid g must sample img[g // reps]."""
    from improving_segmentation_with_selfsupervised_depth_tpu.ops.pallas.warp import (
        bilinear_warp_corners, bilinear_warp_corners_nchw, unnormalize_grid)

    N, H, W, C, S = 2, 16, 128, 3, 2
    rng = np.random.default_rng(11)
    img = jnp.asarray(rng.uniform(0, 1, (N, H, W, C)).astype(np.float32))
    grids = rng.uniform(-1.2, 1.2, (N, S, H, W, 2)).astype(np.float32)

    ix, iy = unnormalize_grid(jnp.asarray(grids.reshape(N * S, H, W, 2)), H, W)
    out, dfx, dfy = bilinear_warp_corners_nchw(img, ix, iy, reps=S,
                                               interpret=True)
    assert out.shape == (N * S, C, H, W)

    for n in range(N):
        for s in range(S):
            ix1, iy1 = unnormalize_grid(jnp.asarray(grids[n:n + 1, s]), H, W)
            o1, fx1, fy1 = bilinear_warp_corners(img[n:n + 1], ix1, iy1,
                                                 interpret=True)
            g = n * S + s
            np.testing.assert_array_equal(
                np.asarray(out[g]), np.asarray(o1[0].transpose(2, 0, 1)))
            np.testing.assert_array_equal(
                np.asarray(dfx[g]), np.asarray(fx1[0].transpose(2, 0, 1)))
            np.testing.assert_array_equal(
                np.asarray(dfy[g]), np.asarray(fy1[0].transpose(2, 0, 1)))


def test_warp_kernel_smooth_fast_path():
    """Settled-regime grids (tiny per-tile span) take the kernel's smooth
    row-scan path (dynamic-roll row extraction, warp.py tile_body_smooth).
    Pin exact indexing across 8-row group straddles, fractional sub-pixel
    offsets, and image borders."""
    from improving_segmentation_with_selfsupervised_depth_tpu.ops.pallas.warp import (
        bilinear_warp_corners, unnormalize_grid)
    from improving_segmentation_with_selfsupervised_depth_tpu.ops.resample import (
        grid_sample)

    N, H, W, C = 2, 64, 128, 3
    rng = np.random.default_rng(11)
    img = jnp.asarray(rng.uniform(0, 1, (N, H, W, C)).astype(np.float32))
    img = img.astype(jnp.bfloat16).astype(jnp.float32)  # bf16-exact values
    gy, gx = np.meshgrid(np.linspace(-1, 1, H), np.linspace(-1, 1, W),
                         indexing="ij")
    # constant shift of 7.5 rows crosses every aligned 8-row group boundary;
    # +smooth low-amplitude ripple keeps per-tile span < 6 (the cond bound);
    # the shift also drives bottom rows past the border-clamp edge
    ripple = 0.8 * np.sin(np.linspace(0, 6.28, W))[None, None, :]
    gx2 = gx[None] + (3.25 + ripple) * 2 / (W - 1)
    gy2 = gy[None] + (7.5 - ripple) * 2 / (H - 1)
    grid = jnp.asarray(np.broadcast_to(np.stack([gx2[0], gy2[0]], -1),
                                       (N, H, W, 2)).astype(np.float32))
    ix, iy = unnormalize_grid(grid, H, W)
    out, dfx, dfy = bilinear_warp_corners(img, ix, iy, interpret=True)
    ref = grid_sample(img, grid, align_corners=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_warp_kernel_smooth_path_toggle():
    """`set_smooth_path(False)` (bench.py's Mosaic-fallback probe) routes all
    tiles through the aligned group scan; results must match the default
    kernel bit-for-bit on a smooth grid that would otherwise take the
    dynamic-roll path."""
    from improving_segmentation_with_selfsupervised_depth_tpu.ops.pallas import warp

    N, H, W, C = 1, 32, 128, 2
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.uniform(0, 1, (N, H, W, C)).astype(np.float32))
    gy, gx = np.meshgrid(np.linspace(-1, 1, H), np.linspace(-1, 1, W),
                         indexing="ij")
    grid = jnp.asarray(np.broadcast_to(
        np.stack([gx + 1.7 * 2 / (W - 1), gy + 2.2 * 2 / (H - 1)], -1),
        (N, H, W, 2)).astype(np.float32))
    ix, iy = warp.unnormalize_grid(grid, H, W)
    default = warp.bilinear_warp_corners(img, ix, iy, interpret=True)
    warp.set_smooth_path(False)
    try:
        fallback = warp.bilinear_warp_corners(img, ix, iy, interpret=True)
    finally:
        warp.set_smooth_path(True)
    for a, b in zip(default, fallback):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
