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
