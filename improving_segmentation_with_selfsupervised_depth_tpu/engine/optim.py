"""Optimizers, LR schedules, per-submodule LR groups and freezing — optax.

TPU-native re-design of the reference's torch param-group machinery:
- per-submodule LRs (reference train.py:67-101 `get_train_params`) become an
  `optax.multi_transform` over top-level param-tree labels
- `requires_grad=False` freezing (reference joint_segmentation_depth.py:158-179)
  becomes `optax.set_to_zero` on the frozen labels — updates are zeroed inside
  the compiled step, no host logic
- the PAD per-task split (reference joint_segmentation_depth_decoder.py:118-132)
  maps mtl_decoder sub-branches to the depth/segmentation groups
- LR schedulers (reference utils/schedulers.py) are pure functions
  step -> multiplicative factor; ReduceLROnPlateau is a host-side controller
  whose scale multiplies the update inside the step (engine/state.py lr_scale)
- optimizer registry mirrors reference utils/optimizers.py:7-29, including
  asgd with torch.optim.ASGD's live-iterate semantics (`_scale_by_asgd`)
"""

from __future__ import annotations

import logging
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

logger = logging.getLogger("segsde")

# --------------------------------------------------------------------------
# Param labeling
# --------------------------------------------------------------------------

# PAD branches belonging to the "depth" task (reference PAD.depth_params:
# depth decoder + the attention producing features *for the seg branch*).
_PAD_DEPTH = {"depth_dec", "sa_seg"}
_PAD_SEG = {"seg_dec", "sa_depth", "seg_final_head", "seg_intermediate_head"}


def label_of(top: str, second: Optional[str] = None) -> str:
    if top == "encoder":
        return "encoder"
    if top in ("pose", "pose_encoder"):
        return "pose"
    if top == "depth":
        return "depth"
    if top == "segmentation":
        return "segmentation"
    if top == "mtl_decoder":
        if second in _PAD_DEPTH:
            return "depth"
        if second in _PAD_SEG:
            return "segmentation"
        return "segmentation"
    if top == "imnet_encoder":
        return "frozen"
    return "default"


def build_param_labels(params: Dict[str, Any], model_cfg: Dict[str, Any]) -> Dict[str, Any]:
    """Label pytree matching `params` with group names; freeze flags rewrite a
    group's labels to 'frozen'."""
    freeze = {
        "encoder": model_cfg.get("freeze_backbone", False),
        "depth": model_cfg.get("freeze_depth", False),
        "pose": model_cfg.get("freeze_pose", False),
        "segmentation": model_cfg.get("freeze_segmentation", False),
    }

    def label_tree(tree, top, second=None):
        if isinstance(tree, dict):
            return {
                k: label_tree(v, top, k if top == "mtl_decoder" and second is None else second)
                for k, v in tree.items()
            }
        lbl = label_of(top, second)
        if freeze.get(lbl, False):
            return "frozen"
        return lbl

    return {k: label_tree(v, k) for k, v in params.items()}


# --------------------------------------------------------------------------
# Schedules: step -> multiplicative factor in [0, 1]
# --------------------------------------------------------------------------


def build_lr_factor_fn(sched_cfg: Optional[Dict[str, Any]]) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Mirror of reference utils/schedulers.py:11-57 as a pure factor(step).

    Note: the reference's `poly_lr` (PolynomialLR, schedulers.py:68-80) is
    effectively constant due to its boolean-or condition; real runs use
    `poly_lr_2`. We implement `poly_lr` as the *intended* polynomial decay and
    keep `poly_lr_2` exact.
    """
    if sched_cfg is None:
        return lambda step: jnp.asarray(1.0, jnp.float32)
    cfg = dict(sched_cfg)
    name = cfg.pop("name")
    warmup_iters = cfg.pop("warmup_iters", None)
    warmup_mode = cfg.pop("warmup_mode", "linear")
    warmup_factor = cfg.pop("warmup_factor", 0.2)

    if name == "constant_lr":
        base = lambda s: jnp.asarray(1.0, jnp.float32)
    elif name in ("poly_lr", "poly_lr_2"):
        max_iter = cfg["max_iter"]
        power = cfg.get("power", cfg.get("gamma", 0.9))
        base = lambda s: jnp.maximum(1e-6, (1.0 - s / max_iter) ** power)
    elif name == "step_lr":
        step_size = cfg["step_size"]
        gamma = cfg.get("gamma", 0.1)
        base = lambda s: gamma ** jnp.floor(s / step_size)
    elif name == "multi_step":
        milestones = jnp.asarray(sorted(cfg["milestones"]), jnp.float32)
        gamma = cfg.get("gamma", 0.1)
        base = lambda s: gamma ** jnp.sum(s >= milestones)
    elif name == "cosine_annealing":
        t_max = cfg["T_max"]
        eta_min = cfg.get("eta_min", 0.0)
        base = lambda s: eta_min + (1 - eta_min) * 0.5 * (1 + jnp.cos(jnp.pi * s / t_max))
    elif name == "exp_lr":
        gamma = cfg.get("gamma", 0.9)
        base = lambda s: gamma**s
    elif name == "reduce_lr_on_plateau":
        # host-controlled via TrainState.lr_scale (engine/trainer.py)
        base = lambda s: jnp.asarray(1.0, jnp.float32)
    else:
        raise NotImplementedError(f"Scheduler {name} not implemented")

    if warmup_iters is None:
        return lambda s: base(jnp.asarray(s, jnp.float32))

    def with_warmup(s):
        s = jnp.asarray(s, jnp.float32)
        cold = base(s)
        if warmup_mode == "linear":
            alpha = s / float(warmup_iters)
            factor = warmup_factor * (1 - alpha) + alpha
        elif warmup_mode == "constant":
            factor = jnp.asarray(warmup_factor, jnp.float32)
        else:
            raise KeyError(f"WarmUp mode {warmup_mode} not implemented")
        return jnp.where(s < warmup_iters, factor * cold, cold)

    return with_warmup


# --------------------------------------------------------------------------
# Optimizer cores (torch-convention updates)
# --------------------------------------------------------------------------


def _asgd_update(lr: float, lambd: float, alpha: float,
                 factor_fn: Callable) -> optax.GradientTransformation:
    """torch.optim.ASGD's live-iterate update (sign and lr included).

    Torch applies the *stored* eta, then recomputes it from the group's
    current (scheduled) lr:  p <- p*(1 - lambd*eta) - eta*grad;
    eta <- lr_k / (1 + lambd*lr_k*k)^alpha  with k the 1-indexed step count
    and lr_k the group lr after any scheduler — reproduced here per group
    with `lr` the group base lr and `factor_fn` the schedule factor, so
    multi-group configs (backbone_lr etc.) and lr schedules track torch
    exactly (eta state starts at the base lr like torch's init).

    The averaged iterate `ax` that torch also maintains is never read by the
    reference (it applies the optimizer like any other, train.py uses live
    params throughout), so it is deliberately not materialized —
    live-parameter trajectories are identical.

    Emits -eta*(grad + lambd*param), i.e. the COMPLETE update; the caller
    must not add a trailing -lr*schedule scale.
    """

    def init_fn(params):
        del params
        return {"count": jnp.zeros([], jnp.int32),
                "eta": jnp.asarray(lr, jnp.float32)}

    def update_fn(updates, state, params=None):
        assert params is not None, "asgd requires params"
        eta = state["eta"]
        new_updates = jax.tree_util.tree_map(
            lambda g, p: -eta * (g + lambd * p), updates, params
        )
        k = state["count"] + 1
        lr_k = lr * factor_fn(state["count"])
        new_eta = lr_k * (1.0 + lambd * lr_k * k.astype(jnp.float32)) ** (-alpha)
        return new_updates, {"count": k, "eta": new_eta}

    return optax.GradientTransformation(init_fn, update_fn)


def _optimizer_core(name: str, ocfg: Dict[str, Any]) -> optax.GradientTransformation:
    wd = ocfg.get("weight_decay", 0.0)
    parts = []
    if wd:
        parts.append(optax.add_decayed_weights(wd))  # torch couples L2 into the grad
    if name == "sgd":
        momentum = ocfg.get("momentum", 0.0)
        if momentum:
            parts.append(optax.trace(decay=momentum, nesterov=ocfg.get("nesterov", False)))
    elif name == "adam":
        b1, b2 = ocfg.get("betas", (0.9, 0.999))
        parts.append(optax.scale_by_adam(b1=b1, b2=b2, eps=ocfg.get("eps", 1e-8)))
    elif name == "adamax":
        b1, b2 = ocfg.get("betas", (0.9, 0.999))
        parts.append(optax.scale_by_adamax(b1=b1, b2=b2, eps=ocfg.get("eps", 1e-8)))
    elif name == "adadelta":
        parts.append(optax.scale_by_adadelta(rho=ocfg.get("rho", 0.9), eps=ocfg.get("eps", 1e-6)))
    elif name == "adagrad":
        parts.append(
            optax.scale_by_rss(
                initial_accumulator_value=ocfg.get("initial_accumulator_value", 0.0),
                eps=ocfg.get("eps", 1e-10),
            )
        )
    elif name == "rmsprop":
        parts.append(
            optax.scale_by_rms(decay=ocfg.get("alpha", 0.99), eps=ocfg.get("eps", 1e-8))
        )
    else:
        raise NotImplementedError(f"Optimizer {name} not implemented")
    return optax.chain(*parts) if parts else optax.identity()


_GROUP_LR_KEYS = {
    "encoder": "backbone_lr",
    "pose": "pose_lr",
    "depth": "depth_lr",
    "segmentation": "segmentation_lr",
}


def build_optimizer(
    training_cfg: Dict[str, Any],
    model_cfg: Dict[str, Any],
    params: Dict[str, Any],
) -> optax.GradientTransformation:
    """Build the full gradient transformation:

      [masked clip_by_global_norm] -> multi_transform{group: core+(-lr*factor)}

    training_cfg keys used: optimizer{name, lr, backbone_lr, pose_lr,
    depth_lr, segmentation_lr, momentum, weight_decay, ...}, lr_schedule,
    clip_grad_norm, disable_depth_grad_clip.
    """
    ocfg = dict(training_cfg.get("optimizer") or {"name": "sgd", "lr": 0.01})
    name = ocfg.pop("name", "sgd")
    base_lr = ocfg.get("lr", 0.01)
    factor_fn = build_lr_factor_fn(training_cfg.get("lr_schedule"))

    labels = build_param_labels(params, model_cfg)
    # sorted: set iteration order is hash-randomized per process, which would
    # reorder the lowered HLO and defeat the persistent compilation cache
    present = sorted(set(jax.tree_util.tree_leaves(labels)))

    transforms = {}
    for grp in present:
        if grp == "frozen":
            transforms[grp] = optax.set_to_zero()
            continue
        lr = ocfg.get(_GROUP_LR_KEYS.get(grp, ""), base_lr)
        if name == "asgd":
            # asgd owns its lr/sign/schedule (eta state per group)
            core = _asgd_update(lr=lr, lambd=ocfg.get("lambd", 1e-4),
                                alpha=ocfg.get("alpha", 0.75), factor_fn=factor_fn)
            wd = ocfg.get("weight_decay", 0.0)
            transforms[grp] = (optax.chain(optax.add_decayed_weights(wd), core)
                               if wd else core)
            continue
        transforms[grp] = optax.chain(
            _optimizer_core(name, ocfg),
            optax.scale_by_schedule(lambda s, _lr=lr: -_lr * factor_fn(s)),
        )
    tx = optax.multi_transform(transforms, labels)

    clip = training_cfg.get("clip_grad_norm")
    if clip is not None:
        if training_cfg.get("disable_depth_grad_clip", False):
            # clip the global norm of encoder+segmentation grads only
            # (reference train.py:520-522)
            mask = jax.tree_util.tree_map(lambda l: l in ("encoder", "segmentation"), labels)
            tx = optax.chain(masked_clip_by_global_norm(clip, mask), tx)
        else:
            tx = optax.chain(optax.clip_by_global_norm(clip), tx)
    return tx


def masked_clip_by_global_norm(max_norm: float, mask) -> optax.GradientTransformation:
    """Clip the global norm computed over (and applied to) masked leaves only."""

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        masked = jax.tree_util.tree_map(
            lambda m, u: u if m else jnp.zeros_like(u), mask, updates
        )
        gnorm = optax.global_norm(masked)
        scale = jnp.minimum(1.0, max_norm / (gnorm + 1e-6))
        new_updates = jax.tree_util.tree_map(
            lambda m, u: u * scale if m else u, mask, updates
        )
        return new_updates, state

    return optax.GradientTransformation(init_fn, update_fn)
