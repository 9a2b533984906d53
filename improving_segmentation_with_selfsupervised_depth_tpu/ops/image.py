"""Image-space ops: SSIM, edge-aware smoothness, on-device strong augmentation.

All ops are NHWC, jittable, and use `jax.random` keys instead of host RNG so
they can live *inside* the compiled train step (the reference runs kornia
augmentations per step on the GPU, loader/transformsgpu.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _avg_pool3x3_valid(x: jnp.ndarray) -> jnp.ndarray:
    """3x3/stride-1 VALID average pool (NHWC)."""
    s = lax.reduce_window(x, 0.0, lax.add, (1, 3, 3, 1), (1, 1, 1, 1), "VALID")
    return s / 9.0


def ssim(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """SSIM dissimilarity map in [0, 1], 3x3 average-pool formulation with
    reflection padding. Reference models/monodepth_layers.py:224-254.

    Returns clamp((1 - SSIM)/2, 0, 1), shape (N, H, W, C).
    """
    c1 = 0.01**2
    c2 = 0.03**2
    pad = [(0, 0), (1, 1), (1, 1), (0, 0)]
    xp = jnp.pad(x, pad, mode="reflect")
    yp = jnp.pad(y, pad, mode="reflect")

    mu_x = _avg_pool3x3_valid(xp)
    mu_y = _avg_pool3x3_valid(yp)
    sigma_x = _avg_pool3x3_valid(xp * xp) - mu_x * mu_x
    sigma_y = _avg_pool3x3_valid(yp * yp) - mu_y * mu_y
    sigma_xy = _avg_pool3x3_valid(xp * yp) - mu_x * mu_y

    ssim_n = (2 * mu_x * mu_y + c1) * (2 * sigma_xy + c2)
    ssim_d = (mu_x * mu_x + mu_y * mu_y + c1) * (sigma_x + sigma_y + c2)
    return jnp.clip((1.0 - ssim_n / ssim_d) * 0.5, 0.0, 1.0)


def _avg_pool3x3_valid_nchw(x: jnp.ndarray) -> jnp.ndarray:
    """3x3/stride-1 VALID average pool over the last two (H, W) dims."""
    s = lax.reduce_window(x, 0.0, lax.add, (1, 1, 3, 3), (1, 1, 1, 1), "VALID")
    return s / 9.0


def ssim_nchw(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """`ssim` for NCHW tensors — same math, windows over the trailing (H, W)
    dims. The photometric loss consumes the Pallas warp kernel's native NCHW
    output directly (ops/resample.py grid_sample_pack_nchw), and (H, W)-minor
    is also the layout reduce_window tiles best on TPU."""
    c1 = 0.01**2
    c2 = 0.03**2
    pad = [(0, 0), (0, 0), (1, 1), (1, 1)]
    xp = jnp.pad(x, pad, mode="reflect")
    yp = jnp.pad(y, pad, mode="reflect")

    mu_x = _avg_pool3x3_valid_nchw(xp)
    mu_y = _avg_pool3x3_valid_nchw(yp)
    sigma_x = _avg_pool3x3_valid_nchw(xp * xp) - mu_x * mu_x
    sigma_y = _avg_pool3x3_valid_nchw(yp * yp) - mu_y * mu_y
    sigma_xy = _avg_pool3x3_valid_nchw(xp * yp) - mu_x * mu_y

    ssim_n = (2 * mu_x * mu_y + c1) * (2 * sigma_xy + c2)
    ssim_d = (mu_x * mu_x + mu_y * mu_y + c1) * (sigma_x + sigma_y + c2)
    return jnp.clip((1.0 - ssim_n / ssim_d) * 0.5, 0.0, 1.0)


def smoothness_loss(disp: jnp.ndarray, img: jnp.ndarray) -> jnp.ndarray:
    """Edge-aware disparity smoothness (scalar).

    Reference models/monodepth_layers.py:208-221. `disp` (N,H,W,1), `img` (N,H,W,3).
    """
    grad_disp_x = jnp.abs(disp[:, :, :-1, :] - disp[:, :, 1:, :])
    grad_disp_y = jnp.abs(disp[:, :-1, :, :] - disp[:, 1:, :, :])

    grad_img_x = jnp.mean(jnp.abs(img[:, :, :-1, :] - img[:, :, 1:, :]), axis=3, keepdims=True)
    grad_img_y = jnp.mean(jnp.abs(img[:, :-1, :, :] - img[:, 1:, :, :]), axis=3, keepdims=True)

    grad_disp_x = grad_disp_x * jnp.exp(-grad_img_x)
    grad_disp_y = grad_disp_y * jnp.exp(-grad_img_y)
    return jnp.mean(grad_disp_x) + jnp.mean(grad_disp_y)


# ---------------------------------------------------------------------------
# Strong augmentation (on-device, inside the jitted semi-supervised step).
# Reference: loader/transformsgpu.py (kornia-based, per-batch host RNG).
# ---------------------------------------------------------------------------


def _gaussian_kernel1d(size: int, sigma: jnp.ndarray) -> jnp.ndarray:
    half = (size - 1) / 2.0
    xs = jnp.arange(size, dtype=jnp.float32) - half
    k = jnp.exp(-0.5 * (xs / sigma) ** 2)
    return k / jnp.sum(k)


def gaussian_blur(key: jax.Array, img: jnp.ndarray, apply_prob_draw: jnp.ndarray | None = None) -> jnp.ndarray:
    """Separable Gaussian blur with random sigma ~ U(0.15, 1.15) and kernel
    size ~= 10% of the image dims (odd), reflect padding.

    Reference loader/transformsgpu.py:20-30 (applied when a uniform draw > 0.5).
    `apply_prob_draw`: optional scalar in [0,1]; if given, blur is applied only
    when it is > 0.5 (branchless select).
    """
    n, h, w, c = img.shape

    def _odd(v: int) -> int:
        k = int(-(-0.1 * v // 1))  # ceil(0.1*v)
        if k % 2 == 0:
            k -= 1
        return max(k, 1)

    ky, kx = _odd(h), _odd(w)
    k_sig, _ = jax.random.split(key)
    sigma = jax.random.uniform(k_sig, (), minval=0.15, maxval=1.15)

    # Depthwise separable filters, HWIO with feature_group_count=c -> (kh, kw, 1, c)
    kern_y = jnp.broadcast_to(_gaussian_kernel1d(ky, sigma).reshape(ky, 1, 1, 1), (ky, 1, 1, c))
    kern_x = jnp.broadcast_to(_gaussian_kernel1d(kx, sigma).reshape(1, kx, 1, 1), (1, kx, 1, c))

    py, px = ky // 2, kx // 2
    out = jnp.pad(img, [(0, 0), (py, py), (0, 0), (0, 0)], mode="reflect")
    out = lax.conv_general_dilated(
        out, kern_y, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )
    out = jnp.pad(out, [(0, 0), (0, 0), (px, px), (0, 0)], mode="reflect")
    out = lax.conv_general_dilated(
        out, kern_x, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )
    if apply_prob_draw is not None:
        out = jnp.where(apply_prob_draw > 0.5, out, img)
    return out


def _rgb_to_gray(img: jnp.ndarray) -> jnp.ndarray:
    r, g, b = img[..., 0:1], img[..., 1:2], img[..., 2:3]
    return 0.299 * r + 0.587 * g + 0.114 * b


def color_jitter(
    key: jax.Array,
    img: jnp.ndarray,
    s: float = 0.25,
    apply_prob_draw: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Random brightness/contrast/saturation/hue jitter of strength `s`,
    shared parameters across the batch (as in the reference, which builds one
    kornia ColorJitter per call — loader/transformsgpu.py:10-17; applied when a
    uniform draw > 0.2).

    TPU re-design: closed-form adjustments in RGB space (hue via YIQ rotation)
    instead of kornia's HSV round-trip; fully fused elementwise math.
    """
    kb, kc, ks, kh = jax.random.split(key, 4)
    fb = jax.random.uniform(kb, (), minval=1 - s, maxval=1 + s)
    fc = jax.random.uniform(kc, (), minval=1 - s, maxval=1 + s)
    fs = jax.random.uniform(ks, (), minval=1 - s, maxval=1 + s)
    fh = jax.random.uniform(kh, (), minval=-s, maxval=s) * 2.0 * jnp.pi

    out = jnp.clip(img * fb, 0.0, 1.0)
    mean = jnp.mean(_rgb_to_gray(out), axis=(1, 2, 3), keepdims=True)
    out = jnp.clip((out - mean) * fc + mean, 0.0, 1.0)
    gray = _rgb_to_gray(out)
    out = jnp.clip((out - gray) * fs + gray, 0.0, 1.0)

    # Hue rotation in YIQ space.
    cosh, sinh = jnp.cos(fh), jnp.sin(fh)
    ryiq = jnp.array(
        [[0.299, 0.587, 0.114], [0.5959, -0.2746, -0.3213], [0.2115, -0.5227, 0.3112]],
        dtype=jnp.float32,
    )
    yiq2rgb = jnp.array(
        [[1.0, 0.956, 0.619], [1.0, -0.272, -0.647], [1.0, -1.106, 1.703]],
        dtype=jnp.float32,
    )
    rot = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], dtype=jnp.float32)
    rot = rot.at[1, 1].set(cosh).at[1, 2].set(-sinh).at[2, 1].set(sinh).at[2, 2].set(cosh)
    m = yiq2rgb @ rot @ ryiq
    out = jnp.clip(jnp.einsum("ij,nhwj->nhwi", m, out), 0.0, 1.0)

    if apply_prob_draw is not None:
        out = jnp.where(apply_prob_draw > 0.2, out, img)
    return out
