"""PyTorch -> Flax weight conversion for the reference's checkpoints.

The reference ships pretrained SDE components as torch .pth state dicts
(models/utils.py:108-172 registry: encoder.pth / depth.pth / pose_encoder.pth
/ pose.pth). This module converts them into our NHWC Flax param trees so the
dec5 -> dec6 -> semi-supervised transfer chain (and numerical parity checks)
can run from the published weights.

Conventions:
- torch conv weight (O, I, kH, kW) -> flax kernel (kH, kW, I, O)
- torch BN weight/bias -> flax scale/bias; running_mean/var -> batch_stats
- torchvision resnet layout maps onto models/resnet.py naming:
  layer{X}.{B}.conv{K} -> layer{X}_{B-0}/conv{K}; downsample.0 -> ds_conv;
  BN creation order in our blocks: BatchNorm_0..2(+3 for bottleneck ds)
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

_STAGE_SIZES = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3),
                101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}


def _np(t):
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def _conv(sd, key):
    return _np(sd[key]).transpose(2, 3, 1, 0)


def _bn_params(sd, prefix):
    return {"scale": _np(sd[prefix + ".weight"]), "bias": _np(sd[prefix + ".bias"])}


def _bn_stats(sd, prefix):
    return {"mean": _np(sd[prefix + ".running_mean"]), "var": _np(sd[prefix + ".running_var"])}


def convert_resnet_encoder(sd: Dict[str, Any], depth: int,
                           prefix: str = "encoder.") -> Tuple[Dict, Dict]:
    """Convert a (possibly multi-image) torchvision-style resnet state dict
    (as wrapped by the reference ResnetEncoder) to our ResNetEncoder trees."""
    bottleneck = depth > 34
    params: Dict[str, Any] = {
        "conv1": {"kernel": _conv(sd, prefix + "conv1.weight")},
        "bn1": _bn_params(sd, prefix + "bn1"),
    }
    stats: Dict[str, Any] = {"bn1": _bn_stats(sd, prefix + "bn1")}

    for stage in range(1, 5):
        for b in range(_STAGE_SIZES[depth][stage - 1]):
            tpre = f"{prefix}layer{stage}.{b}."
            name = f"layer{stage}_{b}"
            p: Dict[str, Any] = {}
            s: Dict[str, Any] = {}
            n_convs = 3 if bottleneck else 2
            for k in range(1, n_convs + 1):
                p[f"conv{k}"] = {"kernel": _conv(sd, tpre + f"conv{k}.weight")}
                p[f"BatchNorm_{k - 1}"] = _bn_params(sd, tpre + f"bn{k}")
                s[f"BatchNorm_{k - 1}"] = _bn_stats(sd, tpre + f"bn{k}")
            if tpre + "downsample.0.weight" in sd:
                p["ds_conv"] = {"kernel": _conv(sd, tpre + "downsample.0.weight")}
                p[f"BatchNorm_{n_convs}"] = _bn_params(sd, tpre + "downsample.1")
                s[f"BatchNorm_{n_convs}"] = _bn_stats(sd, tpre + "downsample.1")
            params[name] = p
            stats[name] = s
    return params, stats


def _convblock(sd, tpre):
    # reference ConvBlock: block.0 = Conv3x3(pad+conv), block.1 = BN | Identity
    p = {"Conv3x3_0": {"Conv_0": {
        "kernel": _conv(sd, tpre + "block.0.conv.weight"),
        "bias": _np(sd[tpre + "block.0.conv.bias"]),
    }}}
    s = {}
    if tpre + "block.1.weight" in sd:
        p["BatchNorm_0"] = _bn_params(sd, tpre + "block.1")
        s["BatchNorm_0"] = _bn_stats(sd, tpre + "block.1")
    return p, s


def _aspp(sd, tpre, n_rates, pooling):
    """torchvision-style ASPP (reference models/model_parts.py:5-32) ->
    our layers.ASPP (ConvBNReLU_0..N + pooled branch + projection)."""
    p: Dict[str, Any] = {}
    s: Dict[str, Any] = {}
    idx = 0

    def put_convbn(conv_key, bn_key, has_bias=False):
        nonlocal idx
        cp = {"kernel": _conv(sd, conv_key)}
        p[f"ConvBNReLU_{idx}"] = {"Conv_0": cp, "BatchNorm_0": _bn_params(sd, bn_key)}
        s[f"ConvBNReLU_{idx}"] = {"BatchNorm_0": _bn_stats(sd, bn_key)}
        idx += 1

    put_convbn(tpre + "convs.0.0.weight", tpre + "convs.0.1")          # 1x1 branch
    for r in range(n_rates):                                           # atrous branches
        put_convbn(tpre + f"convs.{1 + r}.0.weight", tpre + f"convs.{1 + r}.1")
    if pooling:                                                        # pooled branch
        k = 1 + n_rates
        put_convbn(tpre + f"convs.{k}.1.weight", tpre + f"convs.{k}.2")
    put_convbn(tpre + "project.0.weight", tpre + "project.1")          # projection
    return p, s


def convert_depth_decoder(
    sd: Dict[str, Any],
    *,
    scales=(0, 1, 2, 3),
    n_upconv: int = 4,
    use_skips: bool = True,
    intermediate_aspp: bool = False,
    aspp_rates=(6, 12, 18),
    aspp_pooling: bool = True,
    n_project_skip_ch: int = -1,
    batch_norm: bool = False,
) -> Tuple[Dict, Dict]:
    """Convert the reference DepthDecoder state dict (ModuleList order,
    depth_decoder.py:43-72) to our DepthDecoder trees."""
    order = []
    for i in range(n_upconv, -1, -1):
        order.append(("upconv", i, 0))
        if use_skips and i > 0:
            order.append(("skip_proj", i))
        order.append(("upconv", i, 1))
    for s_ in scales:
        order.append(("dispconv", s_))

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for pos, entry in enumerate(order):
        tpre = f"decoder.{pos}."
        if entry[0] == "upconv":
            i, j = entry[1], entry[2]
            name = f"upconv_{i}_{j}"
            if i == n_upconv and j == 0 and intermediate_aspp:
                p, s = _aspp(sd, tpre, len(aspp_rates), aspp_pooling)
            else:
                p, s = _convblock(sd, tpre)
            params[name] = p
            if s:
                stats[name] = s
        elif entry[0] == "skip_proj":
            i = entry[1]
            if n_project_skip_ch == -1:
                continue  # Identity
            name = f"skip_proj_{i}"
            params[name] = {"Conv_0": {"kernel": _conv(sd, tpre + "0.weight")},
                            "BatchNorm_0": _bn_params(sd, tpre + "1")}
            stats[name] = {"BatchNorm_0": _bn_stats(sd, tpre + "1")}
        else:  # dispconv
            s_ = entry[1]
            if tpre + "conv.weight" not in sd:
                continue
            params[f"dispconv_{s_}"] = {"Conv_0": {
                "kernel": _conv(sd, tpre + "conv.weight"),
                "bias": _np(sd[tpre + "conv.bias"]),
            }}
    return params, stats


def convert_pose_decoder(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Reference PoseDecoder (pose_decoder.py:29-37, ModuleList 'net.{i}')."""
    def conv(i):
        return {"kernel": _conv(sd, f"net.{i}.weight"), "bias": _np(sd[f"net.{i}.bias"])}

    return {"squeeze": conv(0), "pose_0": conv(1), "pose_1": conv(2), "pose_2": conv(3)}


def _infer_depth_from_sd(sd, prefix):
    def blocks(layer):
        return len({k[len(prefix):].split(".")[1] for k in sd
                    if k.startswith(prefix + f"layer{layer}.")})

    has_conv3 = any(".conv3." in k for k in sd)
    if not has_conv3:
        return 18 if blocks(1) == 2 else 34
    l3 = blocks(3)
    if l3 == 6:
        return 50
    if l3 == 23:
        return 101
    return 152


def maybe_load_torch_component(path: str, params, batch_stats, name: str,
                               depth_decoder_cfg: Optional[Dict[str, Any]] = None):
    """Load a reference .pth component file into our param/stat trees."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    new_params = dict(params)
    new_bs = dict(batch_stats) if batch_stats else {}

    if name in ("encoder", "pose_encoder", "imnet_encoder"):
        prefix = "encoder." if any(k.startswith("encoder.") for k in sd) else ""
        depth = _infer_depth_from_sd(sd, prefix)
        p, s = convert_resnet_encoder(sd, depth, prefix)
        # multi-image input adaptation: replicate conv1 across stacked frames
        # and average (reference models/resnet_encoder.py:57-60)
        tmpl_conv1 = params.get(name, {}).get("conv1", {}).get("kernel")
        if tmpl_conv1 is not None:
            in_tmpl = np.shape(tmpl_conv1)[2]
            in_loaded = p["conv1"]["kernel"].shape[2]
            if in_tmpl != in_loaded and in_tmpl % in_loaded == 0:
                rep = in_tmpl // in_loaded
                p["conv1"]["kernel"] = np.concatenate(
                    [p["conv1"]["kernel"]] * rep, axis=2) / rep
        new_params[name] = p
        new_bs[name] = s
    elif name == "depth":
        cfg = depth_decoder_cfg or {}
        p, s = convert_depth_decoder(sd, **cfg)
        new_params[name] = p
        if s:
            new_bs[name] = s
    elif name == "pose":
        new_params[name] = convert_pose_decoder(sd)
    else:
        raise NotImplementedError(f"torch conversion for component {name}")
    _validate_tree_shapes(params.get(name), new_params[name], name)
    return new_params, new_bs


def _validate_tree_shapes(template, loaded, name, path=""):
    if template is None:
        return
    if isinstance(template, dict):
        missing = set(template) - set(loaded or {})
        extra = set(loaded or {}) - set(template)
        if missing or extra:
            raise ValueError(f"{name}{path}: missing={missing} extra={extra}")
        for k in template:
            _validate_tree_shapes(template[k], loaded[k], name, f"{path}/{k}")
    else:
        if tuple(np.shape(template)) != tuple(np.shape(loaded)):
            raise ValueError(
                f"{name}{path}: shape {np.shape(loaded)} != expected {np.shape(template)}")
