"""Full-model PyTorch checkpoint conversion (best_model.pkl interop).

The reference saves complete training checkpoints as
`{"model_state": JointSegmentationMonodepth.state_dict(), ...}`
(train.py:360-375) and `best_model_without_opt.pkl` for inference
(inference.py:161). This module converts such state dicts into our full Flax
param/batch-stat trees so reference-trained models can be evaluated and
fine-tuned in this framework.

Key layout (reference container, joint_segmentation_depth.py:10-18):
  models.encoder.encoder.*            torchvision resnet
  models.imnet_encoder.encoder.*
  models.pose_encoder.encoder.*       multi-image resnet18
  models.pose.net.{0..3}.*            PoseDecoder
  models.depth.decoder.{i}.*          DepthDecoder (ModuleList order)
  models.segmentation.unet_dec.decoder.{i}.*   JointSegDepthDecoder
  models.segmentation.project.seg{L}.0.weight
  models.segmentation.head.{j}.*      Sequential(dropout?, conv, bn, relu, dropout, conv)
  models.mtl_decoder.{depth_dec,seg_dec}.decoder.{i}.*   PAD branches
  models.mtl_decoder.sa_{depth,seg}.{conv,attention}.weight
  models.mtl_decoder.seg_{final,intermediate}_head.0.*
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

from .torch_interop import (
    _bn_params,
    _bn_stats,
    _conv,
    _np,
    _validate_tree_shapes,
    convert_depth_decoder,
    convert_pose_decoder,
    convert_resnet_encoder,
)


def _sub_sd(sd: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def _depth_args_of(model_cfg: Dict[str, Any]) -> Dict[str, Any]:
    da = dict(model_cfg.get("depth_args") or {})
    return {
        "n_upconv": da.get("n_upconv", 4),
        "intermediate_aspp": da.get("intermediate_aspp", False),
        "aspp_rates": tuple(da.get("aspp_rates", (6, 12, 18))),
        "aspp_pooling": da.get("aspp_pooling", True),
        "n_project_skip_ch": da.get("n_project_skip_ch", -1),
        "batch_norm": da.get("batch_norm", False),
    }


def _convert_joint_seg_decoder(sd: Dict[str, Any], model_cfg: Dict[str, Any]):
    """JointSegDepthDecoder (reference joint_segmentation_depth_decoder.py:11-75)."""
    seg_args = dict(model_cfg.get("segmentation_args") or {})
    layers = seg_args.get("layers", [9])
    head_inter = seg_args.get("head_inter", True)
    layer_dropout = seg_args.get("layer_dropout", 0)

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    dd = _depth_args_of(model_cfg)
    p, s = convert_depth_decoder(_sub_sd(sd, "unet_dec."), scales=(0, 1, 2, 3), **dd)
    params["unet_dec"] = p
    if s:
        stats["unet_dec"] = s
    for layer in layers:
        params[f"project_seg{layer}"] = {
            "kernel": _conv(sd, f"project.seg{layer}.0.weight")}
    # head Sequential indices (reference 49-53): 0 dropout|identity, then
    # [conv, bn, relu, dropout] if head_inter, final 1x1 conv
    base = 1
    if head_inter:
        params["head_conv"] = {"kernel": _conv(sd, f"head.{base}.weight")}
        params["head_bn"] = _bn_params(sd, f"head.{base + 1}")
        stats["head_bn"] = _bn_stats(sd, f"head.{base + 1}")
        cls_idx = base + 4
    else:
        cls_idx = base  # Identity at base? reference: head_conv=[Identity]
        # find the final conv index: last weight key in head.*
        cls_idx = max(int(k.split(".")[1]) for k in sd
                      if k.startswith("head.") and k.endswith(".weight"))
    params["classifier"] = {"kernel": _conv(sd, f"head.{cls_idx}.weight"),
                            "bias": _np(sd[f"head.{cls_idx}.bias"])}
    return params, stats


def _convert_pad(sd: Dict[str, Any], model_cfg: Dict[str, Any]):
    """PAD decoder (reference joint_segmentation_depth_decoder.py:78-184)."""
    dd = _depth_args_of(model_cfg)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for branch in ("depth_dec", "seg_dec"):
        sub = _sub_sd(sd, branch + ".")
        p, s = convert_depth_decoder(sub, scales=(0, 1, 2, 3), **dd)
        params[branch] = p
        if s:
            stats[branch] = s
    for sa in ("sa_depth", "sa_seg"):
        params[sa] = {"Conv_0": {"kernel": _conv(sd, f"{sa}.conv.weight")},
                      "Conv_1": {"kernel": _conv(sd, f"{sa}.attention.weight")}}
    for head, name in (("seg_final_head", "seg_final_head"),
                       ("seg_intermediate_head", "seg_intermediate_head")):
        if f"{head}.0.weight" in sd:
            params[name] = {"kernel": _conv(sd, f"{head}.0.weight"),
                            "bias": _np(sd[f"{head}.0.bias"])}
    return params, stats


def convert_full_model(
    sd: Dict[str, Any],
    model_cfg: Dict[str, Any],
    template_params: Optional[Dict[str, Any]] = None,
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Convert a reference `model_state` dict into (params, batch_stats)."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    for enc in ("encoder", "imnet_encoder", "pose_encoder"):
        prefix = f"models.{enc}.encoder."
        if any(k.startswith(prefix) for k in sd):
            sub = _sub_sd(sd, f"models.{enc}.")
            from .torch_interop import _infer_depth_from_sd

            depth = _infer_depth_from_sd(sub, "encoder.")
            params[enc], stats[enc] = convert_resnet_encoder(sub, depth, "encoder.")

    if any(k.startswith("models.pose.") for k in sd):
        params["pose"] = convert_pose_decoder(_sub_sd(sd, "models.pose."))

    if any(k.startswith("models.depth.") for k in sd):
        p, s = convert_depth_decoder(_sub_sd(sd, "models.depth."),
                                     scales=(0, 1, 2, 3), **_depth_args_of(model_cfg))
        params["depth"] = p
        if s:
            stats["depth"] = s

    if any(k.startswith("models.segmentation.") for k in sd):
        p, s = _convert_joint_seg_decoder(_sub_sd(sd, "models.segmentation."), model_cfg)
        params["segmentation"] = p
        if s:
            stats["segmentation"] = s

    if any(k.startswith("models.mtl_decoder.") for k in sd):
        p, s = _convert_pad(_sub_sd(sd, "models.mtl_decoder."), model_cfg)
        params["mtl_decoder"] = p
        if s:
            stats["mtl_decoder"] = s

    if template_params is not None:
        for k in template_params:
            if k in params:
                _validate_tree_shapes(template_params[k], params[k], k)
    return params, stats


def load_reference_checkpoint(path: str, model_cfg: Dict[str, Any],
                              template_params: Optional[Dict[str, Any]] = None):
    """Load a reference best_model[_without_opt].pkl and convert it."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model_state", ckpt)
    return convert_full_model(sd, model_cfg, template_params)
