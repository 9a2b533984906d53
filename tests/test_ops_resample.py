"""Parity tests: grid_sample vs torch.nn.functional.grid_sample (border, align_corners=True)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from improving_segmentation_with_selfsupervised_depth_tpu.ops import grid_sample


def _case(seed, n=2, c=3, h=9, w=11, gh=7, gw=5, scale=1.3):
    rng = np.random.default_rng(seed)
    img = rng.standard_normal((n, c, h, w)).astype(np.float32)
    grid = (rng.uniform(-scale, scale, (n, gh, gw, 2))).astype(np.float32)
    return img, grid


def test_grid_sample_matches_torch_inside_and_border():
    img, grid = _case(0)
    ref = F.grid_sample(
        torch.from_numpy(img), torch.from_numpy(grid), mode="bilinear",
        padding_mode="border", align_corners=True,
    ).numpy()
    got = grid_sample(jnp.asarray(img.transpose(0, 2, 3, 1)), jnp.asarray(grid))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), ref, rtol=1e-5, atol=1e-5)


def test_grid_sample_far_out_of_range():
    img, grid = _case(1, scale=5.0)
    ref = F.grid_sample(
        torch.from_numpy(img), torch.from_numpy(grid), mode="bilinear",
        padding_mode="border", align_corners=True,
    ).numpy()
    got = grid_sample(jnp.asarray(img.transpose(0, 2, 3, 1)), jnp.asarray(grid))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), ref, rtol=1e-5, atol=1e-5)


def test_grid_sample_identity_grid():
    img, _ = _case(2, gh=9, gw=11)
    h, w = 9, 11
    ys, xs = np.meshgrid(np.linspace(-1, 1, h), np.linspace(-1, 1, w), indexing="ij")
    grid = np.stack([xs, ys], axis=-1)[None].repeat(2, axis=0).astype(np.float32)
    got = grid_sample(jnp.asarray(img.transpose(0, 2, 3, 1)), jnp.asarray(grid))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), img, rtol=1e-5, atol=1e-5)


def test_grid_sample_gradients_match_torch():
    img, grid = _case(3)
    timg = torch.from_numpy(img).requires_grad_(True)
    tgrid = torch.from_numpy(grid).requires_grad_(True)
    F.grid_sample(timg, tgrid, mode="bilinear", padding_mode="border", align_corners=True).sum().backward()

    def f(i, g):
        return grid_sample(i, g).sum()

    gi, gg = jax.grad(f, argnums=(0, 1))(jnp.asarray(img.transpose(0, 2, 3, 1)), jnp.asarray(grid))
    np.testing.assert_allclose(np.asarray(gi).transpose(0, 3, 1, 2), timg.grad.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gg), tgrid.grad.numpy(), rtol=1e-4, atol=1e-4)
