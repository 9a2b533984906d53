"""Parity tests: resize ops vs torch.nn.functional.interpolate (CPU golden)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from improving_segmentation_with_selfsupervised_depth_tpu.ops import (
    resize_bilinear,
    resize_nearest,
    upsample2x_nearest,
)


def _rand(n, c, h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, c, h, w)).astype(np.float32)


@pytest.mark.parametrize("align_corners", [True, False])
@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((8, 12), (16, 24)), ((16, 24), (8, 12)), ((7, 9), (13, 5)), ((4, 4), (4, 4)), ((5, 5), (1, 1))],
)
def test_bilinear_matches_torch(align_corners, in_hw, out_hw):
    x = _rand(2, 3, *in_hw)
    ref = F.interpolate(torch.from_numpy(x), size=out_hw, mode="bilinear", align_corners=align_corners).numpy()
    got = resize_bilinear(jnp.asarray(x.transpose(0, 2, 3, 1)), out_hw, align_corners=align_corners)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("in_hw,out_hw", [((8, 12), (16, 24)), ((16, 24), (8, 12)), ((7, 9), (13, 5))])
def test_nearest_matches_torch(in_hw, out_hw):
    x = _rand(2, 3, *in_hw, seed=1)
    ref = F.interpolate(torch.from_numpy(x), size=out_hw, mode="nearest").numpy()
    got = resize_nearest(jnp.asarray(x.transpose(0, 2, 3, 1)), out_hw)
    np.testing.assert_array_equal(np.asarray(got).transpose(0, 3, 1, 2), ref)


def test_upsample2x_nearest():
    x = _rand(2, 4, 6, 5, seed=2)
    ref = F.interpolate(torch.from_numpy(x), scale_factor=2, mode="nearest").numpy()
    got = upsample2x_nearest(jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_array_equal(np.asarray(got).transpose(0, 3, 1, 2), ref)


def test_bilinear_3d_input():
    x = _rand(2, 1, 8, 8, seed=3)[:, 0]
    got = resize_bilinear(jnp.asarray(x), (16, 16))
    assert got.shape == (2, 16, 16)
