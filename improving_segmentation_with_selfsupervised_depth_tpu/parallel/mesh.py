"""Mesh + sharding helpers for the data-parallel training step."""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(devices: Optional[Sequence[jax.Device]] = None, axis_name: str = "data") -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis_name: str = "data") -> Any:
    """Place a host batch dict on the mesh, sharded along the leading axis.

    Single-process meshes use a plain `device_put` of the full batch.
    On multi-host meshes (a v5p/v5e pod slice with one process per host) each
    process passes only ITS batch rows — the per-host shard of the global
    batch — and `jax.make_array_from_process_local_data` assembles the global
    sharded array without ever materializing the full batch on one host.
    """
    sh = batch_sharding(mesh, axis_name)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)

    def put(x):
        local = np.asarray(x)
        global_shape = (local.shape[0] * jax.process_count(), *local.shape[1:])
        return jax.make_array_from_process_local_data(sh, local, global_shape)

    return jax.tree_util.tree_map(put, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), tree)


def jit_train_step(train_step, mesh: Mesh, axis_name: str = "data", with_unlabeled: bool = True):
    """jit the train step with state replicated and batches sharded over the
    data axis; XLA/GSPMD inserts the gradient psum over ICI."""
    rep = replicated(mesh)
    shard = batch_sharding(mesh, axis_name)
    in_shardings = (rep, shard, shard if with_unlabeled else None, rep)
    return jax.jit(train_step, in_shardings=in_shardings,
                   out_shardings=(rep, rep), donate_argnums=(0,))


def jit_eval_step(eval_step, mesh: Mesh, axis_name: str = "data"):
    rep = replicated(mesh)
    shard = batch_sharding(mesh, axis_name)
    return jax.jit(eval_step, in_shardings=(rep, shard, rep),
                   out_shardings=(rep, rep, shard))
