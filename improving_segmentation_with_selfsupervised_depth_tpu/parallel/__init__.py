"""Device-mesh data parallelism (pjit/GSPMD).

The reference is single-GPU (SURVEY §2.6); this module is the new TPU-native
scaling layer: a 1-D `data` mesh, batch sharded over it, params/state
replicated. XLA inserts the gradient/metric all-reduces over ICI; BatchNorm
batch statistics (jnp.mean over the sharded batch axis) become cross-replica
automatically under GSPMD — i.e. sync-BN by construction.
"""

from .mesh import data_mesh, shard_batch, replicate, jit_train_step, jit_eval_step
from .spatial import (
    jit_spatial_forward,
    shard_batch_spatial,
    spatial_batch_sharding,
    spatial_mesh,
)

__all__ = ["data_mesh", "shard_batch", "replicate", "jit_train_step", "jit_eval_step",
           "spatial_mesh", "spatial_batch_sharding", "shard_batch_spatial",
           "jit_spatial_forward"]
