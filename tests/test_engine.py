"""Engine integration tests: jitted train/eval steps on an 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from improving_segmentation_with_selfsupervised_depth_tpu.data.synthetic import (
    make_synthetic_batch,
)
from improving_segmentation_with_selfsupervised_depth_tpu.engine.optim import (
    build_optimizer,
    build_param_labels,
)
from improving_segmentation_with_selfsupervised_depth_tpu.engine.state import (
    create_train_state,
    init_ema_params,
)
from improving_segmentation_with_selfsupervised_depth_tpu.engine.train_steps import (
    StepConfig,
    make_eval_step,
    make_train_step,
    step_config_from_cfg,
)
from improving_segmentation_with_selfsupervised_depth_tpu.models import build_model
from improving_segmentation_with_selfsupervised_depth_tpu.parallel import (
    data_mesh,
    jit_eval_step,
    jit_train_step,
    shard_batch,
    replicate,
)

H, W = 64, 96


def _to_jnp(batch):
    return {k: jnp.asarray(v) for k, v in batch.items()}


def _supervised_setup(freeze_backbone=False):
    model_cfg = {
        "backbone_name": "resnet18",
        "segmentation_name": "joint_seg_depth_dec",
        "segmentation_args": {"layers": [9]},
        "depth_args": {},
        "disable_monodepth": True,
        "disable_pose": True,
        "frame_ids": [0],
        "freeze_backbone": freeze_backbone,
    }
    training_cfg = {
        "optimizer": {"name": "sgd", "lr": 0.05, "momentum": 0.9, "backbone_lr": 0.005},
        "lr_schedule": {"name": "constant_lr"},
        "clip_grad_norm": 10.0,
    }
    model = build_model(model_cfg, n_classes=19)
    batch = _to_jnp(make_synthetic_batch(2, H, W, frame_ids=(0,), num_scales=1))
    params = model.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)}, batch)
    tx = build_optimizer(training_cfg, model_cfg, params["params"])
    state = create_train_state(model, jax.random.PRNGKey(0), batch, tx)
    cfg = StepConfig(segmentation_lambda=1.0, disable_monodepth=True, disable_pose=True,
                     frame_ids=(0,), scales=(0,))
    return model, tx, state, cfg, batch


def test_supervised_train_step_updates_and_decreases_loss():
    model, tx, state, cfg, batch = _supervised_setup()
    step = jax.jit(make_train_step(model, cfg, tx))
    rng = jax.random.PRNGKey(42)
    losses = []
    for i in range(3):
        state, metrics = step(state, batch, None, rng)
        losses.append(float(metrics["total_loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # tiny overfit on a fixed batch
    assert int(state.step) == 3


def test_frozen_backbone_params_unchanged():
    model, tx, state, cfg, batch = _supervised_setup(freeze_backbone=True)
    enc_before = jax.tree_util.tree_map(np.asarray, state.params["encoder"])
    step = jax.jit(make_train_step(model, cfg, tx))
    state, _ = step(state, batch, None, jax.random.PRNGKey(0))
    enc_after = state.params["encoder"]
    flat_b = jax.tree_util.tree_leaves(enc_before)
    flat_a = jax.tree_util.tree_leaves(enc_after)
    for b, a in zip(flat_b, flat_a):
        np.testing.assert_array_equal(np.asarray(a), b)
    # but the seg decoder did move
    seg_b = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(np.asarray, state.params["segmentation"]))
    assert any(np.abs(x).sum() > 0 for x in seg_b)


def test_eval_step_confusion_and_miou():
    model, tx, state, cfg, batch = _supervised_setup()
    ev = jax.jit(make_eval_step(model, cfg))
    metrics, conf, aux = ev(state, batch, jax.random.PRNGKey(0))
    assert conf.shape == (19, 19)
    n_valid = float(np.sum(np.asarray(batch["lbl"]) != 250))
    assert float(jnp.sum(conf)) == n_valid
    assert np.isfinite(float(metrics["segmentation_loss"]))
    assert aux["pred"].shape == (2, H, W)


def _sde_setup():
    model_cfg = {
        "backbone_name": "resnet18",
        "segmentation_name": None,
        "depth_args": {"intermediate_aspp": True, "aspp_rates": [1, 2]},
        "frame_ids": [0, -1, 1],
        "num_scales": 1,
    }
    training_cfg = {"optimizer": {"name": "adam", "lr": 1e-4},
                    "lr_schedule": None}
    model = build_model(model_cfg, n_classes=19)
    batch = _to_jnp(make_synthetic_batch(2, H, W, frame_ids=(0, -1, 1), num_scales=1))
    params = model.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)}, batch)
    tx = build_optimizer(training_cfg, model_cfg, params["params"])
    state = create_train_state(model, jax.random.PRNGKey(0), batch, tx)
    cfg = StepConfig(monodepth_lambda=1.0, segmentation_lambda=0.0,
                     frame_ids=(0, -1, 1), scales=(0,), disparity_smoothness=1e-3)
    return model, tx, state, cfg, batch


def test_sde_train_step_pose_and_depth_learn():
    model, tx, state, cfg, batch = _sde_setup()
    step = jax.jit(make_train_step(model, cfg, tx))
    p0 = np.asarray(jax.tree_util.tree_leaves(state.params["pose"])[0])
    d0 = np.asarray(jax.tree_util.tree_leaves(state.params["depth"])[0])
    state, metrics = step(state, batch, None, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["mono_loss"]))
    assert float(metrics["mono_loss"]) > 0
    p1 = np.asarray(jax.tree_util.tree_leaves(state.params["pose"])[0])
    d1 = np.asarray(jax.tree_util.tree_leaves(state.params["depth"])[0])
    assert not np.allclose(p0, p1)
    assert not np.allclose(d0, d1)


@pytest.mark.parametrize("mix_mask", ["class", "depthcomp", "depthhist", None])
def test_semisup_step_on_8device_mesh(mix_mask):
    model_cfg = {
        "backbone_name": "resnet18",
        "segmentation_name": "joint_seg_depth_dec",
        "segmentation_args": {"layers": [9]},
        "depth_args": {},
        "disable_monodepth": True,
        "disable_pose": True,
        "frame_ids": [0],
    }
    training_cfg = {"optimizer": {"name": "sgd", "lr": 0.01, "momentum": 0.9},
                    "lr_schedule": {"name": "step_lr", "step_size": 100, "gamma": 0.1}}
    model = build_model(model_cfg, n_classes=19)
    n = 8
    batch = _to_jnp(make_synthetic_batch(n, H, W, frame_ids=(0,), num_scales=1))
    ubatch = _to_jnp(make_synthetic_batch(n, H, W, frame_ids=(0,), num_scales=1,
                                          with_unlabeled_extras=True, seed=7))
    params = model.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)}, batch)
    tx = build_optimizer(training_cfg, model_cfg, params["params"])
    state = create_train_state(model, jax.random.PRNGKey(0), batch, tx, with_ema=True)
    cfg = StepConfig(
        segmentation_lambda=1.0, disable_monodepth=True, disable_pose=True,
        frame_ids=(0,), scales=(0,),
        unlabeled=True, use_ema=True, consistency_weight=1.0, mix_mask=mix_mask,
        unlabeled_color_jitter=True, unlabeled_blur=True, mix_use_gt=True,
        depthcomp_margin=0.05, depthcomp_foreground_threshold=(0.25, 0.3),
    )
    mesh = data_mesh()
    assert mesh.devices.size == 8
    step = jit_train_step(make_train_step(model, cfg, tx), mesh)
    state = replicate(state, mesh)
    batch_s = shard_batch(batch, mesh)
    ubatch_s = shard_batch(ubatch, mesh)
    state, metrics = step(state, batch_s, ubatch_s, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["total_loss"]))
    assert float(metrics["unlabeled_loss"]) >= 0
    # EMA moved toward the new params
    e = jax.tree_util.tree_leaves(state.ema_params)[0]
    assert np.isfinite(np.asarray(e)).all()


def test_step_config_from_cfg_roundtrip():
    cfg = {
        "training": {
            "monodepth_lambda": 1.0,
            "segmentation_lambda": 0.0,
            "feat_dist_lambda": 0.01,
            "unlabeled_segmentation": {
                "consistency_weight": 1.0,
                "mix_mask": "depthcomp",
                "color_jitter": True,
                "blur": True,
                "depthcomp_margin": 0.0505,
                "depthcomp_foreground_threshold": [0.2, 0.4],
                "backward_first_pseudo_label": False,
            },
        },
        "model": {"disable_monodepth": False, "segmentation_name": "mtl_pad"},
        "monodepth_options": {"frame_ids": [0, -1, 1], "num_scales": 4,
                              "min_depth": 0.1, "max_depth": 100},
        "data": {"n_classes": 19, "depth_teacher": "x"},
    }
    sc = step_config_from_cfg(cfg)
    assert sc.mix_mask == "depthcomp"
    assert sc.depthcomp_foreground_threshold == (0.2, 0.4)
    assert sc.use_ema and sc.unlabeled
    assert sc.ema_names == ("depth", "encoder", "mtl_decoder")
    assert sc.has_depth_teacher
