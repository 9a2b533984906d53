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
