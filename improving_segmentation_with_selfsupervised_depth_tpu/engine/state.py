"""Train state & EMA teacher — functional counterparts of the reference's
stateful Trainer members.

The EMA teacher (reference train.py:328-358) is a second param tree updated
*inside* the jitted train step:
    alpha = min(1 - 1/(step+1), alpha_teacher)
    ema = alpha * ema + (1 - alpha) * param
applied to the masked submodules only (full model by default; depth/pose[/
encoder] for `save_monodepth_ema`; depth/encoder/mtl_decoder for PAD,
reference train.py:316-326).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Optional[Any] = None
    lr_scale: jnp.ndarray = struct.field(default_factory=lambda: jnp.asarray(1.0, jnp.float32))


def ema_model_names(training_cfg: Dict[str, Any], model_cfg: Dict[str, Any]) -> Optional[tuple]:
    """Which top-level submodules the EMA covers (None = all).

    Reference train.py:316-326, 328-344.
    """
    if training_cfg.get("save_monodepth_ema", False):
        names = ["depth", "pose", "pose_encoder"]
        if not model_cfg.get("freeze_backbone", False):
            names.append("encoder")
        return tuple(names)
    if model_cfg.get("segmentation_name") == "mtl_pad":
        return ("depth", "encoder", "mtl_decoder")
    return None


def init_ema_params(params: Any) -> Any:
    """Detached full copy (reference create_ema_model copies all shared
    params; non-EMA'd submodules are never read from the teacher subset that
    matters)."""
    return jax.tree_util.tree_map(jnp.array, params)


def update_ema(
    ema_params: Any,
    params: Any,
    step: jnp.ndarray,
    alpha_teacher: float = 0.99,
    names: Optional[tuple] = None,
) -> Any:
    """One EMA update (reference train.py:346-358), masked to `names`."""
    alpha = jnp.minimum(1.0 - 1.0 / (step.astype(jnp.float32) + 1.0), alpha_teacher)

    def upd(e, p):
        return alpha * e + (1.0 - alpha) * p

    if names is None:
        return jax.tree_util.tree_map(upd, ema_params, params)
    out = dict(ema_params)
    for k in ema_params:
        if k in names and k in params:
            out[k] = jax.tree_util.tree_map(upd, ema_params[k], params[k])
    return out


def create_train_state(
    model,
    rng: jax.Array,
    example_batch: Dict[str, jnp.ndarray],
    tx: optax.GradientTransformation,
    with_ema: bool = False,
) -> TrainState:
    variables = model.init({"params": rng, "dropout": rng}, example_batch)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        ema_params=init_ema_params(params) if with_ema else None,
    )
