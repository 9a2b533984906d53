"""train_main CLI path + SDE-pretraining (monodepth-only) configuration."""

import os

import numpy as np

from improving_segmentation_with_selfsupervised_depth_tpu.engine.trainer import (
    Trainer,
    train_main,
)


def _sde_cfg(tmp_path):
    """Monodepth-pretraining-shaped config (configs/cityscapes_monodepth_*_crop
    semantics) on the synthetic dataset."""
    return {
        "seed": 42,
        "machine": "ws",
        "model": {
            "arch": "joint_segmentation_depth",
            "backbone_name": "resnet18",
            "segmentation_name": None,
            "segmentation_args": None,
            "depth_args": {"intermediate_aspp": True, "aspp_rates": [1, 2]},
            "disable_monodepth": False,
            "disable_pose": False,
            "freeze_backbone": True,
            "backbone_pretraining": "none",
        },
        "monodepth_options": {"frame_ids": [0, -1, 1], "num_scales": 1,
                              "height": 64, "width": 96},
        "data": {"dataset": "synthetic", "n_samples": 8, "img_size": (64, 96),
                 "n_workers": 2, "augmentations": {}},
        "training": {
            "log_path": str(tmp_path / "sde"),
            "train_iters": 2, "batch_size": 2, "val_batch_size": 2,
            "print_interval": 1, "val_interval": {"0": 1},
            "optimizer": {"name": "adam", "lr": 1e-4},
            "lr_schedule": {"name": "multi_step", "milestones": [1], "gamma": 0.1},
            "segmentation_lambda": 0.0, "monodepth_lambda": 1.0,
            "save_model": True,
            "save_separate_monodepth_models": True,
            "monodepth_loss": {"min_depth": 0.1, "max_depth": 100,
                               "test_min_depth": 1e-3, "test_max_depth": 80,
                               "disparity_smoothness": 1e-3},
        },
    }


def test_sde_pretraining_trainer_and_component_export(tmp_path):
    cfg = _sde_cfg(tmp_path)
    trainer = Trainer(cfg, run_id="sde")
    # frozen backbone: encoder label is 'frozen'
    enc_before = np.asarray(
        __import__("jax").tree_util.tree_leaves(trainer.state.params["encoder"])[0])
    trainer.train()
    enc_after = np.asarray(
        __import__("jax").tree_util.tree_leaves(trainer.state.params["encoder"])[0])
    np.testing.assert_array_equal(enc_before, enc_after)
    # monodepth validation loss was computed without labels
    assert trainer.mIoU == 0.0

    trainer.save_monodepth_models()
    for comp in ("depth", "pose_encoder", "pose"):
        assert os.path.exists(os.path.join(trainer.log_path, f"{comp}.msgpack"))
    # frozen backbone -> encoder not exported (reference train.py:385-386)
    assert not os.path.exists(os.path.join(trainer.log_path, "encoder.msgpack"))


def test_train_main_writes_run_artifacts(tmp_path):
    cfg = _sde_cfg(tmp_path)
    cfg["training"]["save_separate_monodepth_models"] = True
    train_main(cfg, run_id="run_xyz")
    log_path = cfg["training"]["log_path"]
    assert os.path.exists(os.path.join(log_path, "cfg.yml"))
    assert os.path.exists(os.path.join(log_path, "depth.msgpack"))
    assert any(f.startswith("run_") and f.endswith(".log")
               for f in os.listdir(log_path))
