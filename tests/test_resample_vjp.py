"""The corner-saving custom-VJP warp must match the autodiff warp exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from improving_segmentation_with_selfsupervised_depth_tpu.ops.resample import (
    grid_sample,
    grid_sample_nograd_image,
)


def _case(seed=0, n=2, c=3, h=9, w=11, gh=7, gw=5, scale=1.4):
    rng = np.random.default_rng(seed)
    img = rng.standard_normal((n, h, w, c)).astype(np.float32)
    grid = rng.uniform(-scale, scale, (n, gh, gw, 2)).astype(np.float32)
    return jnp.asarray(img), jnp.asarray(grid)


def test_forward_matches_reference_impl():
    img, grid = _case()
    np.testing.assert_allclose(
        np.asarray(grid_sample_nograd_image(img, grid)),
        np.asarray(grid_sample(img, grid)), rtol=1e-6, atol=1e-6)


def test_grid_gradient_matches_autodiff():
    img, grid = _case(seed=1)

    def f_custom(g):
        return jnp.sum(jnp.sin(grid_sample_nograd_image(img, g)))

    def f_auto(g):
        return jnp.sum(jnp.sin(grid_sample(img, g)))

    g1 = jax.grad(f_custom)(grid)
    g2 = jax.grad(f_auto)(grid)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-5)


def test_grid_gradient_far_out_of_range_is_zero():
    img, grid = _case(seed=2, scale=6.0)
    g = jax.grad(lambda gr: jnp.sum(grid_sample_nograd_image(img, gr)))(grid)
    # fully out-of-range samples clamp to the border -> zero grid gradient
    far = np.abs(np.asarray(grid)) > 2.0
    both_far = far[..., 0] & far[..., 1]
    assert np.all(np.abs(np.asarray(g)[both_far]) < 1e-5)
