"""Spatial (image-height) partitioning for high-resolution inference.

A TPU-native capability beyond the reference (which is single-GPU and
activation-bound at high resolution, inference.py:51-77): shard the image
H axis across mesh devices and let GSPMD insert the conv halo exchanges,
pooling psums and resize collectives over ICI. One 2048x1024 Cityscapes
frame's activations then spread over the `spatial` axis instead of living
on one chip — full-resolution forward passes without tiling seams (the
result is bit-identical to the unsharded forward, modulo collective
reduction order) and without the reference's crop-and-stitch approximation.

Composes with data parallelism: a ("data", "spatial") mesh shards batch
rows over `data` and image rows over `spatial`.

NOTE: inference/eval only. The training step's Pallas warp kernel has no
spatial partitioning rule (ops/resample.py shard_maps it over the data
axis only), so spatial sharding is exposed for the pose-free forward path.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def spatial_mesh(n_spatial: int, devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """("data", "spatial") mesh: `n_spatial` devices along the image-height
    axis, the rest along the batch axis."""
    devices = list(devices if devices is not None else jax.devices())
    assert len(devices) % n_spatial == 0, (len(devices), n_spatial)
    arr = np.asarray(devices).reshape(len(devices) // n_spatial, n_spatial)
    return Mesh(arr, ("data", "spatial"))


def spatial_batch_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC batch: rows over `data`, image height over `spatial`."""
    return NamedSharding(mesh, P("data", "spatial"))


def shard_batch_spatial(batch: Any, mesh: Mesh) -> Any:
    """Place a host batch dict on the mesh: image-like (N, H, ...) arrays
    sharded (data, spatial); small per-sample arrays (intrinsics K, scalars)
    sharded on `data` only or replicated. Sharding is layout, not math —
    this is purely a placement heuristic."""
    n_data, n_sp = mesh.shape["data"], mesh.shape["spatial"]
    sh = spatial_batch_sharding(mesh)
    dsh = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())

    def put(x):
        x = np.asarray(x)
        if (x.ndim >= 3 and x.shape[1] % n_sp == 0 and x.shape[1] >= 8 * n_sp
                and x.shape[0] % n_data == 0):
            return jax.device_put(x, sh)
        if x.ndim >= 1 and x.shape[0] % n_data == 0:
            return jax.device_put(x, dsh)
        return jax.device_put(x, rep)

    return jax.tree_util.tree_map(put, batch)


def jit_spatial_forward(forward, mesh: Mesh):
    """jit `forward(variables, batch) -> dict` for spatially-sharded inputs.

    Inputs are committed to their shardings by `shard_batch_spatial` /
    `replicate`, so jit infers them; GSPMD partitions the convs with halo
    exchanges over ICI and keeps activations distributed end-to-end
    (out_shardings left to propagation — outputs stay (data, spatial))."""
    del mesh  # placement is carried by the committed input arrays
    return jax.jit(forward)
