"""Checkpoint / resume + transfer-learning component export.

Counterpart of the reference's pickle checkpoints (train.py:360-410) and
per-submodule .pth export for SDE transfer (train.py:377-390,
models/utils.py:18-97):

- full train state -> one flax-msgpack file (`best_model.msgpack`) plus a
  small JSON sidecar; the whole tree is gathered to host — adequate for this
  model family (params are replicated on the data mesh, tens of MB). If params
  ever become sharded across hosts, switch this layer to orbax.
- best_model semantics: saved on new-best mIoU with {step, best_iou}
- submodule export: depth/pose_encoder/pose[/encoder] as flax msgpack files
  (`depth.msgpack` ...), re-ingested by `load_component_weights` for the
  dec5 -> dec6 -> semi-supervised transfer chain
- `load_torch_checkpoint` (torch_interop.py) converts the reference's
  published PyTorch .pth files into these param trees for numerical parity
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization

from .state import TrainState


def _tree_to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


# One in-flight async save at a time (a newer best-model save always joins
# the previous one first, so writes land in order and at most one extra
# state snapshot is alive).
_pending_save: Optional["threading.Thread"] = None
_pending_error: Optional[BaseException] = None


def wait_for_saves() -> None:
    """Block until any in-flight async `save_resume` write has landed.
    Call before reading the checkpoint back or at trainer shutdown.
    Re-raises any exception the background writer hit — a silently lost
    best/last checkpoint is data loss on the preemption-recovery path."""
    global _pending_save, _pending_error
    if _pending_save is not None:
        _pending_save.join()
        _pending_save = None
    if _pending_error is not None:
        err, _pending_error = _pending_error, None
        raise RuntimeError("async checkpoint write failed") from err


def save_resume(ckpt_dir: str, state: TrainState, best_iou: float,
                async_write: bool = False, basename: str = "best_model") -> str:
    """Save full training state (reference save_resume, train.py:360-375).

    Writes are atomic (tmp + rename), so a reader never sees a torn file.
    With `async_write` the device->host gather happens SYNCHRONOUSLY here
    (it must: the trainer's jitted step donates the state's device buffers
    — `donate_argnums=(0,)` in parallel/mesh.py — so the step *after* this
    call deletes them; a background thread reading the device arrays would
    die with "Array has been deleted") and only the serialization + file IO
    run on a background thread. Use `wait_for_saves()` before reading the
    file back; it re-raises writer errors.
    """
    global _pending_save
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, basename + ".msgpack")
    step_snapshot, best_snapshot = int(state.step), float(best_iou)

    # donation-safe host snapshot: one batched device->host gather, taken
    # before the caller can run another (donating) train step
    payload = {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "lr_scale": state.lr_scale,
    }
    if state.ema_params is not None:
        payload["ema_params"] = state.ema_params
    payload = _tree_to_numpy(jax.device_get(payload))

    def _write():
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(serialization.to_bytes(payload))
        os.replace(tmp, path)
        side = os.path.join(ckpt_dir, basename + ".json")
        with open(side + ".tmp", "w") as f:
            json.dump({"step": step_snapshot, "best_iou": best_snapshot}, f)
        os.replace(side + ".tmp", side)

    def _write_async():
        # stash-don't-raise: an exception escaping a daemon thread is only
        # noise; wait_for_saves() re-raises it on the caller's thread instead
        global _pending_error
        try:
            _write()
        except BaseException as e:  # surfaced by wait_for_saves
            _pending_error = e

    if async_write:
        import threading

        wait_for_saves()  # keep writes ordered, bound in-flight snapshots to 1
        _pending_save = threading.Thread(target=_write_async, daemon=True)
        _pending_save.start()
    else:
        wait_for_saves()
        _write()
    return path


def load_resume(ckpt_path: str, state: TrainState, load_model_only: bool = False):
    """Restore state from `save_resume` output (reference train.py:392-410).

    Returns (state, step, best_iou)."""
    wait_for_saves()  # never read past an in-flight async write
    with open(ckpt_path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())

    payload = {
        "step": raw["step"],
        "lr_scale": raw.get("lr_scale", np.asarray(1.0, np.float32)),
        "params": serialization.from_state_dict(_tree_to_numpy(state.params),
                                                raw["params"]),
        "batch_stats": serialization.from_state_dict(
            _tree_to_numpy(state.batch_stats), raw["batch_stats"]),
    }
    if not load_model_only:
        # opt_state restore requires a structurally matching optimizer
        payload["opt_state"] = serialization.from_state_dict(
            state.opt_state, raw["opt_state"])
    if state.ema_params is not None and "ema_params" in raw:
        payload["ema_params"] = serialization.from_state_dict(
            _tree_to_numpy(state.ema_params), raw["ema_params"])

    meta_path = ckpt_path[:-len(".msgpack")] + ".json" \
        if ckpt_path.endswith(".msgpack") else \
        os.path.join(os.path.dirname(ckpt_path), "best_model.json")
    best_iou, step = -100.0, int(payload["step"])
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        best_iou = meta.get("best_iou", -100.0)
        step = meta.get("step", step)

    new_state = state.replace(params=payload["params"], batch_stats=payload["batch_stats"])
    if not load_model_only:
        new_state = new_state.replace(
            opt_state=payload["opt_state"],
            step=np.asarray(payload["step"]),
            lr_scale=np.asarray(payload["lr_scale"]),
        )
        if state.ema_params is not None and "ema_params" in payload:
            new_state = new_state.replace(ema_params=payload["ema_params"])
    return new_state, step, best_iou


_MONODEPTH_COMPONENTS = ("depth", "pose_encoder", "pose")


def save_monodepth_models(
    ckpt_dir: str,
    params: Dict[str, Any],
    batch_stats: Dict[str, Any],
    include_encoder: bool = False,
) -> None:
    """Export SDE components for transfer (reference train.py:377-390)."""
    os.makedirs(ckpt_dir, exist_ok=True)
    names = list(_MONODEPTH_COMPONENTS) + (["encoder"] if include_encoder else [])
    for name in names:
        if name not in params:
            continue
        payload = {"params": _tree_to_numpy(params[name])}
        if batch_stats and name in batch_stats:
            payload["batch_stats"] = _tree_to_numpy(batch_stats[name])
        with open(os.path.join(ckpt_dir, f"{name}.msgpack"), "wb") as f:
            f.write(serialization.to_bytes(payload))


def load_component_weights(
    path: str, params: Dict[str, Any], batch_stats: Dict[str, Any], name: str
):
    """Load one exported component into fresh param/batch-stat trees
    (reference models/utils.py:34-42, 64-72, 87-95). Returns updated trees."""
    with open(path, "rb") as f:
        raw = f.read()
    template = {"params": _tree_to_numpy(params[name])}
    if batch_stats and name in batch_stats:
        template["batch_stats"] = _tree_to_numpy(batch_stats[name])
    payload = serialization.from_bytes(template, raw)
    new_params = dict(params)
    new_params[name] = payload["params"]
    new_bs = dict(batch_stats) if batch_stats else {}
    if "batch_stats" in payload and batch_stats and name in batch_stats:
        new_bs[name] = payload["batch_stats"]
    return new_params, new_bs


def apply_pretraining(
    model_cfg: Dict[str, Any],
    params: Dict[str, Any],
    batch_stats: Dict[str, Any],
    download_model_dir: Optional[str] = None,
):
    """Resolve backbone/depth/pose pretraining names into loaded weights
    (reference models/utils.py:18-97 + gdrive registry 108-172).

    Names containing 'mono' refer to exported SDE checkpoints under
    `download_model_dir/<name>/{encoder,depth,pose_encoder,pose}.msgpack`
    (our export format) or PyTorch .pth files from the reference's registry
    (converted via torch_interop). 'imnet' requires converted torchvision
    weights at `download_model_dir/imnet/<backbone>.msgpack` (zero-egress
    environments can't download them on the fly).
    """
    from .torch_interop import maybe_load_torch_component

    def comp_path(pretrain_name, comp):
        base = os.path.join(download_model_dir or ".", pretrain_name)
        return os.path.join(base, f"{comp}.msgpack"), os.path.join(base, f"{comp}.pth")

    if model_cfg.get("backbone_pretraining") == "imnet" or model_cfg.get(
            "enable_imnet_encoder", False):
        # ImageNet initialization (reference models/utils.py:31-33 via
        # torchvision). Zero-egress: looks for a converted .msgpack or a raw
        # torchvision .pth under <download_model_dir>/imnet/<backbone>.{msgpack,pth}
        backbone = model_cfg.get("backbone_name", "resnet101")
        base = os.path.join(download_model_dir or ".", "imnet")
        targets = []
        if model_cfg.get("backbone_pretraining") == "imnet":
            # the pose encoder is imnet-initialized alongside the backbone
            # (reference models/utils.py:79-81, resnet18 multi-image)
            targets.extend(["encoder", "pose_encoder"])
        if model_cfg.get("enable_imnet_encoder", False):
            targets.append("imnet_encoder")
        for comp in targets:
            if comp not in params:
                continue
            bb = "resnet18" if comp == "pose_encoder" else backbone
            mp = os.path.join(base, f"{bb}.msgpack")
            tp = os.path.join(base, f"{bb}.pth")
            if os.path.exists(mp):
                params, batch_stats = load_component_weights(mp, params, batch_stats, comp)
            elif os.path.exists(tp):
                params, batch_stats = maybe_load_torch_component(tp, params, batch_stats, comp)
            else:
                print(f"WARNING: imnet weights for {backbone} not found under {base}; "
                      f"{comp} stays randomly initialized")

    for cfg_key, comps in (
        ("backbone_pretraining", ["encoder"]),
        ("depth_pretraining", ["depth"]),
        ("pose_pretraining", ["pose_encoder", "pose"]),
    ):
        name = model_cfg.get(cfg_key)
        if not name or name in ("none", "imnet"):
            continue
        if "mono" not in name:
            raise NotImplementedError(f"{cfg_key}={name}")
        for comp in comps:
            if comp not in params:
                continue
            mp, tp = comp_path(name, comp)
            if not os.path.exists(mp) and not os.path.exists(tp):
                # try fetching the published checkpoint (reference
                # models/utils.py:108-172; no-op offline)
                try:
                    from ..utils.gdrive import download_model_if_doesnt_exist

                    download_model_if_doesnt_exist(name, download_model_dir)
                except Exception:
                    pass
            if os.path.exists(mp):
                params, batch_stats = load_component_weights(mp, params, batch_stats, comp)
            elif os.path.exists(tp):
                da = dict(model_cfg.get("depth_args") or {})
                dd_cfg = {
                    "scales": tuple(range(model_cfg.get("num_scales", 4))),
                    "n_upconv": da.get("n_upconv", 4),
                    "intermediate_aspp": da.get("intermediate_aspp", False),
                    "aspp_rates": tuple(da.get("aspp_rates", (6, 12, 18))),
                    "aspp_pooling": da.get("aspp_pooling", True),
                    "n_project_skip_ch": da.get("n_project_skip_ch", -1),
                    "batch_norm": da.get("batch_norm", False),
                } if comp == "depth" else None
                params, batch_stats = maybe_load_torch_component(
                    tp, params, batch_stats, comp, depth_decoder_cfg=dd_cfg)
            else:
                raise FileNotFoundError(
                    f"Pretrained component {comp} for {name} not found at {mp} or {tp}")
    return params, batch_stats
