"""Multi-host `shard_batch` branch (parallel/mesh.py).

A real multi-process run can't execute here, so the process-local
assembly path is pinned with a stubbed `jax.process_count`: the branch
must hand `jax.make_array_from_process_local_data` the per-host local
rows plus the correctly scaled GLOBAL shape, and the single-process
path must stay a plain device_put.
"""

import jax
import jax.numpy as jnp
import numpy as np

from improving_segmentation_with_selfsupervised_depth_tpu.parallel import (
    data_mesh,
    shard_batch,
)
from improving_segmentation_with_selfsupervised_depth_tpu.parallel.mesh import (
    batch_sharding,
)


def test_multihost_branch_global_shape(monkeypatch):
    mesh = data_mesh()
    calls = []

    def fake_make(sharding, local, global_shape):
        calls.append((sharding, np.asarray(local), tuple(global_shape)))
        return "global-array-sentinel"

    monkeypatch.setattr(jax, "process_count", lambda: 4)
    monkeypatch.setattr(jax, "make_array_from_process_local_data", fake_make)

    batch = {"img": np.zeros((2, 8, 8, 3), np.float32),
             "lbl": np.zeros((2, 8, 8), np.int32)}
    out = shard_batch(batch, mesh)

    assert out == {"img": "global-array-sentinel", "lbl": "global-array-sentinel"}
    shapes = {c[2] for c in calls}
    # 2 local rows/host x 4 hosts -> global batch 8, trailing dims unchanged
    assert shapes == {(8, 8, 8, 3), (8, 8, 8)}
    for sharding, local, _ in calls:
        assert local.shape[0] == 2
        assert sharding == batch_sharding(mesh)


def test_single_process_path_unchanged():
    mesh = data_mesh()
    batch = {"img": np.arange(8 * 4, dtype=np.float32).reshape(8, 4)}
    out = shard_batch(batch, mesh)
    assert isinstance(out["img"], jax.Array)
    assert out["img"].shape == (8, 4)
    assert out["img"].sharding == batch_sharding(mesh)
    np.testing.assert_array_equal(np.asarray(out["img"]), batch["img"])
