"""Spatial (H-axis) partitioning of the pose-free forward on the device mesh.

The forward is jitted over a ("data", "spatial") mesh with image height
sharded across devices; GSPMD inserts the conv halo exchanges. Results must
match the unsharded forward to float tolerance (sharding is layout, not
math). TPU-native capability beyond the single-GPU reference (SURVEY §2.6).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from improving_segmentation_with_selfsupervised_depth_tpu.data.synthetic import (
    make_synthetic_batch,
)
from improving_segmentation_with_selfsupervised_depth_tpu.models import build_model
from improving_segmentation_with_selfsupervised_depth_tpu.parallel.spatial import (
    jit_spatial_forward,
    shard_batch_spatial,
    spatial_mesh,
)

MODEL_CFG = {
    "backbone_name": "resnet18",
    "segmentation_name": "joint_seg_depth_dec",
    "segmentation_args": {"layers": [9]},
    "depth_args": {"intermediate_aspp": True, "aspp_rates": [1, 2]},
    "frame_ids": [0, -1, 1],
    "num_scales": 4,
}


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_spatial_forward_matches_unsharded():
    model = build_model(MODEL_CFG, n_classes=19)
    batch = {k: jnp.asarray(v) for k, v in
             make_synthetic_batch(2, 64, 64, frame_ids=(0, -1, 1),
                                  num_scales=4).items()}
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(0)}, batch)

    def forward(variables, batch):
        return model.apply(variables, batch, train=False, use_pose=False)

    ref = forward(variables, batch)

    mesh = spatial_mesh(4)  # 8 devices -> data=2, spatial=4
    assert dict(mesh.shape) == {"data": 2, "spatial": 4}
    sharded_batch = shard_batch_spatial(batch, mesh)
    # image-like entries really are H-sharded
    col = sharded_batch["color_0_0"]
    assert col.sharding.spec == ("data", "spatial")
    svars = jax.device_put(variables, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec()))
    out = jit_spatial_forward(forward, mesh)(svars, sharded_batch)

    for k in ("semantics", "disp_0"):
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   rtol=2e-4, atol=2e-4)
