"""Full-model checkpoint conversion: reference-layout state dict -> Flax trees."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn

from improving_segmentation_with_selfsupervised_depth_tpu.data.synthetic import (
    make_synthetic_batch,
)
from improving_segmentation_with_selfsupervised_depth_tpu.engine.full_model_interop import (
    convert_full_model,
)
from improving_segmentation_with_selfsupervised_depth_tpu.models import build_model

from tests.test_torch_interop import TBasic, TConv3x3, TConvBlock, TResNet


def _decoder_sd(ch_enc=(64, 64, 128, 256, 512), ch_dec=(16, 32, 64, 128, 256),
                scales=4, seed=0):
    torch.manual_seed(seed)
    convs = []
    for i in range(4, -1, -1):
        ci = ch_enc[-1] if i == 4 else ch_dec[i + 1]
        convs.append(TConvBlock(ci, ch_dec[i]))
        ci2 = ch_dec[i] + (ch_enc[i - 1] if i > 0 else 0)
        if i > 0:
            convs.append(nn.Identity())
        convs.append(TConvBlock(ci2, ch_dec[i]))
    for s in range(scales):
        convs.append(TConv3x3(ch_dec[s], 1))
    mods = nn.ModuleList(convs)
    return {f"decoder.{n}.{k}": v for n, m in enumerate(mods)
            for k, v in m.state_dict().items()}


def test_convert_full_joint_model_structure():
    torch.manual_seed(0)
    sd = {}
    enc = TResNet(TBasic, (2, 2, 2, 2))
    sd.update({f"models.encoder.encoder.{k}": v for k, v in enc.state_dict().items()})
    pose_enc = TResNet(TBasic, (2, 2, 2, 2))
    pose_enc.conv1 = nn.Conv2d(6, 64, 7, 2, 3, bias=False)
    sd.update({f"models.pose_encoder.encoder.{k}": v
               for k, v in pose_enc.state_dict().items()})
    pose_net = nn.ModuleList([
        nn.Conv2d(512, 256, 1), nn.Conv2d(256, 256, 3, 1, 1),
        nn.Conv2d(256, 256, 3, 1, 1), nn.Conv2d(256, 12, 1)])
    sd.update({f"models.pose.net.{i}.{k}": v for i, m in enumerate(pose_net)
               for k, v in m.state_dict().items()})
    sd.update({f"models.depth.{k}": v for k, v in _decoder_sd(seed=1).items()})
    # segmentation: unet + project.seg9 + head (dropout, conv, bn, relu, dropout, cls)
    sd.update({f"models.segmentation.unet_dec.{k}": v
               for k, v in _decoder_sd(seed=2).items()})
    sd["models.segmentation.project.seg9.0.weight"] = torch.randn(64, 16, 1, 1)
    sd["models.segmentation.head.1.weight"] = torch.randn(64, 64, 3, 3)
    bn = nn.BatchNorm2d(64)
    sd.update({f"models.segmentation.head.2.{k}": v for k, v in bn.state_dict().items()
               if "num_batches" not in k})
    sd["models.segmentation.head.5.weight"] = torch.randn(19, 64, 1, 1)
    sd["models.segmentation.head.5.bias"] = torch.randn(19)

    model_cfg = {
        "backbone_name": "resnet18",
        "segmentation_name": "joint_seg_depth_dec",
        "segmentation_args": {"layers": [9], "head_inter": True, "output_stride": 1},
        "depth_args": {},
        "frame_ids": [0, -1, 1],
        "num_scales": 4,
    }
    model = build_model(model_cfg, n_classes=19)
    batch = {k: jnp.asarray(v) for k, v in
             make_synthetic_batch(1, 64, 96, frame_ids=(0, -1, 1), num_scales=4).items()}
    rng = jax.random.PRNGKey(0)
    template = model.init({"params": rng, "dropout": rng}, batch)["params"]

    params, stats = convert_full_model(sd, model_cfg, template_params=template)
    assert set(params) == {"encoder", "pose_encoder", "pose", "depth", "segmentation"}
    # converted weights load into the model and produce a forward pass
    variables = {"params": params, "batch_stats": stats}
    out = model.apply(variables, batch, train=False)
    assert "semantics" in out and "disp_0" in out
    assert np.isfinite(np.asarray(out["semantics"], np.float32)).all()
    # spot-check a weight round-trip
    np.testing.assert_allclose(
        np.asarray(params["segmentation"]["classifier"]["bias"]),
        sd["models.segmentation.head.5.bias"].numpy(), rtol=1e-6)


def _decoder_modules(ch_enc=(64, 64, 128, 256, 512), ch_dec=(16, 32, 64, 128, 256),
                     scales=4, seed=0):
    """Torch golden monodepth2 decoder with the reference ModuleList layout;
    returns (ModuleList, forward(feats) -> (disps, stage_outputs))."""
    torch.manual_seed(seed)
    convs = []
    for i in range(4, -1, -1):
        ci = ch_enc[-1] if i == 4 else ch_dec[i + 1]
        convs.append(TConvBlock(ci, ch_dec[i]))
        ci2 = ch_dec[i] + (ch_enc[i - 1] if i > 0 else 0)
        if i > 0:
            convs.append(nn.Identity())
        convs.append(TConvBlock(ci2, ch_dec[i]))
    for s in range(scales):
        convs.append(TConv3x3(ch_dec[s], 1))
    mods = nn.ModuleList(convs)

    def forward(feats):
        idx = 0
        x = feats[-1]
        outs = {}
        for i in range(4, -1, -1):
            x = mods[idx](x); idx += 1
            x = torch.nn.functional.interpolate(x, scale_factor=2, mode="nearest")
            cat = [x]
            if i > 0:
                idx += 1  # Identity skip_proj slot
                cat.append(feats[i - 1])
            x = mods[idx](torch.cat(cat, 1)); idx += 1
            outs[i] = x
        disps = {}
        for s in range(scales):
            disps[s] = torch.sigmoid(mods[idx](outs[s])); idx += 1
        return disps, outs

    return mods, forward


def test_full_joint_model_logits_parity():
    """End-to-end eval parity: a reference-layout torch joint model (encoder +
    depth decoder + JointSegDepthDecoder head) and the converted Flax model
    produce the same semantics logits and disparities on a pinned input.

    This guards the full wiring (feature pyramid indexing, decoder dataflow,
    project/head order, logit upsampling) beyond the per-component parity
    tests — the harness the reference checkpoint eval path relies on."""
    torch.manual_seed(7)
    enc = TResNet(TBasic, (2, 2, 2, 2)).eval()
    for m in enc.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.uniform_(-0.5, 0.5)
            m.running_var.uniform_(0.5, 1.5)
    depth_mods, depth_fwd = _decoder_modules(seed=8)
    unet_mods, unet_fwd = _decoder_modules(seed=9)

    torch.manual_seed(10)
    project = nn.Conv2d(16, 64, 1, bias=False)
    head_conv = nn.Conv2d(64, 64, 3, 1, 1, bias=False)
    head_bn = nn.BatchNorm2d(64).eval()
    head_bn.running_mean.uniform_(-0.5, 0.5)
    head_bn.running_var.uniform_(0.5, 1.5)
    classifier = nn.Conv2d(64, 19, 1)

    sd = {}
    sd.update({f"models.encoder.encoder.{k}": v for k, v in enc.state_dict().items()})
    sd.update({f"models.depth.decoder.{n}.{k}": v for n, m in enumerate(depth_mods)
               for k, v in m.state_dict().items()})
    sd.update({f"models.segmentation.unet_dec.decoder.{n}.{k}": v
               for n, m in enumerate(unet_mods) for k, v in m.state_dict().items()})
    sd["models.segmentation.project.seg9.0.weight"] = project.weight.data
    sd["models.segmentation.head.1.weight"] = head_conv.weight.data
    sd.update({f"models.segmentation.head.2.{k}": v for k, v in head_bn.state_dict().items()
               if "num_batches" not in k})
    sd["models.segmentation.head.5.weight"] = classifier.weight.data
    sd["models.segmentation.head.5.bias"] = classifier.bias.data

    # torch golden forward (reference joint forward seg+depth dataflow,
    # joint_segmentation_depth.py:77-100 + joint_segmentation_depth_decoder.py:55-73)
    x = np.random.default_rng(5).uniform(0, 1, (1, 3, 64, 96)).astype(np.float32)
    with torch.no_grad():
        feats = enc(torch.from_numpy(x))
        ref_disps, _ = depth_fwd(feats)
        _, unet_outs = unet_fwd(feats)
        proj = project(unet_outs[0])  # layer 9 = last decoder stage, full res
        h = torch.relu(head_bn(head_conv(proj)))
        ref_logits = classifier(h)

    model_cfg = {
        "backbone_name": "resnet18",
        "segmentation_name": "joint_seg_depth_dec",
        "segmentation_args": {"layers": [9], "head_inter": True, "output_stride": 1},
        "depth_args": {},
        "frame_ids": [0],
        "num_scales": 4,
        "disable_pose": True,
    }
    model = build_model(model_cfg, n_classes=19)
    params, stats = convert_full_model(sd, model_cfg)
    batch = {"color_aug_0_0": jnp.asarray(x.transpose(0, 2, 3, 1))}
    out = model.apply({"params": params, "batch_stats": stats}, batch, train=False)

    np.testing.assert_allclose(
        np.asarray(out["semantics"]).transpose(0, 3, 1, 2), ref_logits.numpy(),
        rtol=2e-3, atol=2e-4)
    for s in range(4):
        np.testing.assert_allclose(
            np.asarray(out[f"disp_{s}"]).transpose(0, 3, 1, 2), ref_disps[s].numpy(),
            rtol=1e-3, atol=1e-5, err_msg=f"disp {s}")
