"""Pallas warp under data-parallel sharding.

pallas_call has no GSPMD partitioning rule, so the warp kernel must run
under shard_map on a multi-device mesh (ops/resample.py `configure_warp`).
These tests exercise that composition on the 8-device virtual CPU mesh with
the kernel in interpreter mode, against the full-f32 XLA gather path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from improving_segmentation_with_selfsupervised_depth_tpu.ops import resample
from improving_segmentation_with_selfsupervised_depth_tpu.parallel import (
    data_mesh,
    shard_batch,
)


@pytest.fixture
def warp_cfg_guard():
    yield
    resample.configure_warp("auto")


def _inputs(n=8, h=16, w=128, c=3, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 1, (n, h, w, c)).astype(np.float32)
    grid = rng.uniform(-1.1, 1.1, (n, h, w, 2)).astype(np.float32)
    return jnp.asarray(img), jnp.asarray(grid)


def test_pallas_warp_shardmap_matches_xla(warp_cfg_guard):
    mesh = data_mesh()
    assert mesh.devices.size == 8
    img, grid = _inputs()

    resample.configure_warp("xla")
    ref = resample.grid_sample_nograd_image(img, grid)

    resample.configure_warp("pallas", mesh=mesh, interpret=True)
    sharded = shard_batch({"img": img, "grid": grid}, mesh)
    out = jax.jit(resample.grid_sample_nograd_image)(sharded["img"], sharded["grid"])
    # pixel values round through bf16 channel-pair packing in the kernel
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-3)


def test_pallas_warp_shardmap_grad_matches_xla(warp_cfg_guard):
    """Gradient w.r.t. the grid flows through the shard_mapped custom VJP."""
    mesh = data_mesh()
    img, grid = _inputs(seed=1)

    def loss(g, im):
        return jnp.sum(resample.grid_sample_nograd_image(im, g) ** 2)

    # reference on a bf16-rounded image: the kernel's corner fetches round
    # pixel values through bf16, and the grid gradient scales them by
    # ~(w-1)/2, so an f32-image reference would differ by rounding x 63
    resample.configure_warp("xla")
    img_bf16 = img.astype(jnp.bfloat16).astype(jnp.float32)
    ref_grad = jax.grad(loss)(grid, img_bf16)

    resample.configure_warp("pallas", mesh=mesh, interpret=True)
    sharded = shard_batch({"img": img_bf16, "grid": grid}, mesh)
    got_grad = jax.jit(jax.grad(loss))(sharded["grid"], sharded["img"])
    np.testing.assert_allclose(np.asarray(got_grad), np.asarray(ref_grad),
                               atol=1e-3)


def test_auto_mode_requires_divisible_batch(warp_cfg_guard):
    """auto falls back to XLA when the batch can't shard over the mesh."""
    mesh = data_mesh()
    img, grid = _inputs(n=6)  # 6 % 8 != 0
    resample.configure_warp("auto", mesh=mesh, interpret=True)
    assert resample._pallas_dispatch(img, grid) is None
    img8, grid8 = _inputs(n=8)
    assert resample._pallas_dispatch(img8, grid8) == "shard_map"


def test_pallas_warp_force_shardmap_single_device(warp_cfg_guard):
    """force_shard_map=True wraps the kernel in shard_map even on a 1-device
    mesh — the composition tools/check_warp_shardmap_tpu.py runs on real
    hardware to validate the multi-chip code path single-chip."""
    import numpy as _np

    mesh = jax.sharding.Mesh(_np.asarray(jax.devices()[:1]), ("data",))
    img, grid = _inputs(n=4, h=16, w=128)

    resample.configure_warp("xla")
    ref = resample.grid_sample_nograd_image(img, grid)

    resample.configure_warp("pallas", mesh=mesh, interpret=True,
                            force_shard_map=True)
    assert resample._pallas_dispatch(img, grid) == "shard_map"
    out = jax.jit(resample.grid_sample_nograd_image)(img, grid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-3)
