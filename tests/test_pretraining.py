"""Pretraining-weight plumbing: imnet torch checkpoints + the SDE transfer
chain (save_monodepth_models -> apply_pretraining)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn

from improving_segmentation_with_selfsupervised_depth_tpu.data.synthetic import (
    make_synthetic_batch,
)
from improving_segmentation_with_selfsupervised_depth_tpu.engine.checkpoints import (
    apply_pretraining,
    load_component_weights,
    save_monodepth_models,
)
from improving_segmentation_with_selfsupervised_depth_tpu.models import build_model

from tests.test_torch_interop import TBasic, TResNet


def _init_model(model_cfg, h=64, w=96, frames=(0, -1, 1)):
    model = build_model(model_cfg, n_classes=19)
    batch = {k: jnp.asarray(v) for k, v in
             make_synthetic_batch(2, h, w, frame_ids=frames, num_scales=1).items()}
    rng = jax.random.PRNGKey(0)
    v = model.init({"params": rng, "dropout": rng}, batch)
    return model, v["params"], v.get("batch_stats", {})


def test_imnet_torch_checkpoint_loading(tmp_path):
    torch.manual_seed(0)
    tnet = TResNet(TBasic, (2, 2, 2, 2))
    imnet_dir = tmp_path / "imnet"
    imnet_dir.mkdir()
    torch.save(tnet.state_dict(), imnet_dir / "resnet18.pth")

    model_cfg = {
        "backbone_name": "resnet18",
        "segmentation_name": None,
        "depth_args": {},
        "frame_ids": [0, -1, 1],
        "backbone_pretraining": "imnet",
        "num_scales": 1,
    }
    model, params, stats = _init_model(model_cfg)
    params2, stats2 = apply_pretraining(model_cfg, params, stats, str(tmp_path))

    ref_conv1 = tnet.conv1.weight.detach().numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(np.asarray(params2["encoder"]["conv1"]["kernel"]),
                               ref_conv1, rtol=1e-6)
    # pose encoder (2-frame input): conv1 replicated across frames and halved
    pose_conv1 = np.asarray(params2["pose_encoder"]["conv1"]["kernel"])
    assert pose_conv1.shape[2] == 6
    np.testing.assert_allclose(pose_conv1[:, :, :3], ref_conv1 / 2.0, rtol=1e-6)
    np.testing.assert_allclose(pose_conv1[:, :, 3:], ref_conv1 / 2.0, rtol=1e-6)
    # BN running stats came along
    np.testing.assert_allclose(
        np.asarray(stats2["encoder"]["bn1"]["mean"]),
        tnet.bn1.running_mean.numpy(), rtol=1e-6)


def test_sde_transfer_chain_roundtrip(tmp_path):
    """Export depth/pose/encoder from one model, re-ingest into a fresh one
    (the dec5 -> dec6 transfer path, reference models/utils.py:18-97)."""
    model_cfg = {
        "backbone_name": "resnet18",
        "segmentation_name": None,
        "depth_args": {},
        "frame_ids": [0, -1, 1],
        "num_scales": 1,
    }
    _, params, stats = _init_model(model_cfg)
    ckpt_name = "mono_test_checkpoint"
    out_dir = tmp_path / ckpt_name
    save_monodepth_models(str(out_dir), params, stats, include_encoder=True)
    for comp in ("depth", "pose_encoder", "pose", "encoder"):
        assert (out_dir / f"{comp}.msgpack").exists()

    cfg2 = dict(model_cfg)
    cfg2.update({"backbone_pretraining": ckpt_name,
                 "depth_pretraining": ckpt_name,
                 "pose_pretraining": ckpt_name})
    _, fresh_params, fresh_stats = _init_model(cfg2)
    loaded, loaded_stats = apply_pretraining(cfg2, fresh_params, fresh_stats, str(tmp_path))
    for comp in ("depth", "pose_encoder", "pose", "encoder"):
        a = jax.tree_util.tree_leaves(params[comp])
        b = jax.tree_util.tree_leaves(loaded[comp])
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_load_component_weights_single(tmp_path):
    model_cfg = {"backbone_name": "resnet18", "segmentation_name": None,
                 "depth_args": {}, "frame_ids": [0], "disable_pose": True,
                 "num_scales": 1}
    _, params, stats = _init_model(model_cfg, frames=(0,))
    save_monodepth_models(str(tmp_path), params, stats, include_encoder=False)
    _, fresh, fresh_stats = _init_model(model_cfg, frames=(0,))
    loaded, _ = load_component_weights(
        str(tmp_path / "depth.msgpack"), fresh, fresh_stats, "depth")
    a = jax.tree_util.tree_leaves(params["depth"])
    b = jax.tree_util.tree_leaves(loaded["depth"])
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
