"""Parity tests: SSIM, smoothness, CE, berHu, entropy vs torch goldens."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from improving_segmentation_with_selfsupervised_depth_tpu.ops import (
    berhu,
    cross_entropy2d,
    pixel_wise_entropy,
    smoothness_loss,
    ssim,
)
from improving_segmentation_with_selfsupervised_depth_tpu.ops.image import (
    color_jitter,
    gaussian_blur,
)


def _torch_ssim(x, y):
    refl = torch.nn.ReflectionPad2d(1)
    pool = torch.nn.AvgPool2d(3, 1)
    x, y = refl(x), refl(y)
    mu_x, mu_y = pool(x), pool(y)
    sigma_x = pool(x**2) - mu_x**2
    sigma_y = pool(y**2) - mu_y**2
    sigma_xy = pool(x * y) - mu_x * mu_y
    c1, c2 = 0.01**2, 0.03**2
    n = (2 * mu_x * mu_y + c1) * (2 * sigma_xy + c2)
    d = (mu_x**2 + mu_y**2 + c1) * (sigma_x + sigma_y + c2)
    return torch.clamp((1 - n / d) / 2, 0, 1)


def test_ssim_matches_reference_formulation():
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (2, 3, 8, 9)).astype(np.float32)
    y = rng.uniform(0, 1, (2, 3, 8, 9)).astype(np.float32)
    ref = _torch_ssim(torch.from_numpy(x), torch.from_numpy(y)).numpy()
    got = ssim(jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(y.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), ref, rtol=1e-4, atol=1e-5)


def test_smoothness_matches_reference_formulation():
    rng = np.random.default_rng(1)
    disp = rng.uniform(0, 1, (2, 1, 8, 9)).astype(np.float32)
    img = rng.uniform(0, 1, (2, 3, 8, 9)).astype(np.float32)
    td, ti = torch.from_numpy(disp), torch.from_numpy(img)
    gx = torch.abs(td[:, :, :, :-1] - td[:, :, :, 1:])
    gy = torch.abs(td[:, :, :-1, :] - td[:, :, 1:, :])
    ix = torch.mean(torch.abs(ti[:, :, :, :-1] - ti[:, :, :, 1:]), 1, keepdim=True)
    iy = torch.mean(torch.abs(ti[:, :, :-1, :] - ti[:, :, 1:, :]), 1, keepdim=True)
    ref = (gx * torch.exp(-ix)).mean() + (gy * torch.exp(-iy)).mean()
    got = smoothness_loss(jnp.asarray(disp.transpose(0, 2, 3, 1)), jnp.asarray(img.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)


def _ce_case(seed, n=2, c=5, h=6, w=7, ht=None, wt=None, n_ignore=6):
    rng = np.random.default_rng(seed)
    ht, wt = ht or h, wt or w
    logits = rng.standard_normal((n, c, h, w)).astype(np.float32)
    target = rng.integers(0, c, (n, ht, wt))
    flat = target.reshape(-1)
    flat[rng.choice(flat.size, n_ignore, replace=False)] = 250
    return logits, target.astype(np.int64)


def test_cross_entropy_matches_torch():
    logits, target = _ce_case(0)
    ref = F.cross_entropy(torch.from_numpy(logits), torch.from_numpy(target), ignore_index=250)
    got = cross_entropy2d(jnp.asarray(logits.transpose(0, 2, 3, 1)), jnp.asarray(target))
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)


def test_cross_entropy_label_upsampling_matches_torch():
    logits, target = _ce_case(1, h=4, w=5, ht=8, wt=10)
    ti = F.interpolate(torch.from_numpy(logits), size=(8, 10), mode="bilinear", align_corners=True)
    ref = F.cross_entropy(ti, torch.from_numpy(target), ignore_index=250)
    got = cross_entropy2d(jnp.asarray(logits.transpose(0, 2, 3, 1)), jnp.asarray(target))
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)


def test_cross_entropy_pixel_weights_matches_torch():
    logits, target = _ce_case(2)
    rng = np.random.default_rng(22)
    pw = rng.uniform(0.0, 1.0, target.shape).astype(np.float32)
    per = F.cross_entropy(torch.from_numpy(logits), torch.from_numpy(target),
                          reduction="none", ignore_index=250)
    ref = (torch.from_numpy(pw).view(-1) * per.view(-1)).mean()
    got = cross_entropy2d(
        jnp.asarray(logits.transpose(0, 2, 3, 1)), jnp.asarray(target), pixel_weights=jnp.asarray(pw)
    )
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)


def test_berhu_matches_torch():
    rng = np.random.default_rng(3)
    pred = rng.uniform(0, 1, (2, 6, 7, 1)).astype(np.float32)
    target = rng.uniform(0, 1, (2, 6, 7, 1)).astype(np.float32)
    mask = (rng.uniform(0, 1, (2, 6, 7, 1)) > 0.3).astype(np.float32)
    tin, tt, tm = map(torch.from_numpy, (pred, target, mask))
    absdiff = torch.abs(tt - tin) * tm
    C = 0.2 * torch.max(absdiff).item()
    ref = torch.mean(torch.where(absdiff <= C, absdiff, (absdiff * absdiff + C * C) / (2 * C)))
    got = berhu(jnp.asarray(pred), jnp.asarray(target), jnp.asarray(mask))
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)


def test_pixel_wise_entropy_matches_torch():
    rng = np.random.default_rng(4)
    logits = rng.standard_normal((2, 5, 6, 7)).astype(np.float32)
    p = F.softmax(torch.from_numpy(logits), dim=1)
    ref = -torch.sum(p * torch.log2(p + 1e-30), dim=1) / np.log2(5)
    got = pixel_wise_entropy(jnp.asarray(logits.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-4, atol=1e-5)


def test_gaussian_blur_shape_and_branchless_gate():
    rng = np.random.default_rng(5)
    img = rng.uniform(0, 1, (2, 32, 48, 3)).astype(np.float32)
    key = jax.random.PRNGKey(0)
    out = gaussian_blur(key, jnp.asarray(img))
    assert out.shape == img.shape
    # blur reduces total variation
    tv = lambda a: np.abs(np.diff(np.asarray(a), axis=1)).mean()
    assert tv(out) < tv(img)
    same = gaussian_blur(key, jnp.asarray(img), apply_prob_draw=jnp.asarray(0.4))
    np.testing.assert_array_equal(np.asarray(same), img)


def test_color_jitter_shape_range_and_gate():
    rng = np.random.default_rng(6)
    img = rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32)
    key = jax.random.PRNGKey(1)
    out = np.asarray(color_jitter(key, jnp.asarray(img)))
    assert out.shape == img.shape
    assert out.min() >= 0.0 and out.max() <= 1.0
    assert not np.allclose(out, img)
    same = color_jitter(key, jnp.asarray(img), apply_prob_draw=jnp.asarray(0.1))
    np.testing.assert_array_equal(np.asarray(same), img)
