"""End-to-end Trainer smoke tests on the synthetic dataset (the analogue of
the reference's test_experiments.py truncated-budget runs, SURVEY §4)."""

import os

import numpy as np
import pytest

from improving_segmentation_with_selfsupervised_depth_tpu.engine.trainer import (
    Trainer,
    current_val_interval,
)


def _base_cfg(tmp_path, **training_overrides):
    cfg = {
        "seed": 42,
        "model": {
            "arch": "joint_segmentation_depth",
            "backbone_name": "resnet18",
            "segmentation_name": "joint_seg_depth_dec",
            "segmentation_args": {"layers": [9], "head_inter": False, "output_stride": 1},
            "depth_args": {},
            "disable_monodepth": True,
            "disable_pose": True,
            "backbone_pretraining": "imnet",
        },
        "monodepth_options": {
            "frame_ids": [0], "num_scales": 1, "height": 64, "width": 96,
        },
        "data": {
            "dataset": "synthetic",
            "n_samples": 8,
            "img_size": (64, 96),
            "n_workers": 2,
            "augmentations": {},
        },
        "training": {
            "log_path": str(tmp_path / "log"),
            "train_iters": 3,
            "batch_size": 2,
            "val_batch_size": 2,
            "print_interval": 1,
            "val_interval": {"0": 2},
            "optimizer": {"name": "sgd", "lr": 0.01, "momentum": 0.9},
            "lr_schedule": None,
            "segmentation_lambda": 1.0,
            "monodepth_lambda": 0.0,
            "save_model": True,
            "monodepth_loss": {
                "min_depth": 0.1, "max_depth": 100,
                "test_min_depth": 1e-3, "test_max_depth": 80,
                "disparity_smoothness": 1e-3,
            },
            **training_overrides,
        },
    }
    return cfg


def test_current_val_interval_thresholds():
    cfg = {"training": {"val_interval": {"0": 100, "100": 2500, "30000": 500}}}
    assert current_val_interval(cfg, 50) == 100
    assert current_val_interval(cfg, 101) == 2500
    assert current_val_interval(cfg, 30001) == 500


def test_supervised_trainer_end_to_end(tmp_path):
    cfg = _base_cfg(tmp_path)
    trainer = Trainer(cfg, run_id="t1")
    final_step = trainer.train()
    assert final_step >= 2
    assert trainer.mIoU >= 0.0  # validation ran
    # best checkpoint written
    assert os.path.exists(os.path.join(trainer.log_path, "best_model.msgpack"))
    # metrics logged
    assert os.path.exists(os.path.join(trainer.log_path, "metrics.jsonl"))


def test_trainer_resume_roundtrip(tmp_path):
    cfg = _base_cfg(tmp_path)
    t1 = Trainer(cfg, run_id="t1")
    t1.train()
    # re-save the *final* state explicitly (best_model may be from an earlier
    # validation step)
    ckpt = t1.save_resume(3)

    cfg2 = _base_cfg(tmp_path)
    cfg2["training"]["resume"] = ckpt
    t2 = Trainer(cfg2, run_id="t2")
    p1 = np.asarray(
        __import__("jax").tree_util.tree_leaves(t1.state.params)[0])
    p2 = np.asarray(
        __import__("jax").tree_util.tree_leaves(t2.state.params)[0])
    np.testing.assert_array_equal(p1, p2)


def test_semisup_trainer_with_depthmix(tmp_path):
    cfg = _base_cfg(
        tmp_path,
        unlabeled_segmentation={
            "consistency_weight": 1.0,
            "mix_mask": "depthcomp",
            "color_jitter": True,
            "blur": True,
            "only_unlabeled": False,
            "only_labeled": False,
            "mix_use_gt": True,
            "depthcomp_margin": 0.03,
            "depthcomp_foreground_threshold": 0.0,
            "backward_first_pseudo_label": False,
            "debug_image": True,
        },
    )
    cfg["data"]["restrict_to_subset"] = {"mode": "random", "n_subset": 4}
    trainer = Trainer(cfg, run_id="t3")
    assert trainer.step_cfg.use_ema
    assert trainer.step_cfg.debug_images
    final_step = trainer.train()
    assert final_step >= 2
    assert trainer.state.ema_params is not None
    # DepthMix composite debug panels were dumped (reference train.py:726-744)
    assert os.path.isdir(os.path.join(trainer.log_path, "class_mix_debug"))


def test_auto_resume_from_last_model(tmp_path):
    """Preemption recovery: a re-launched run with the same log_path and
    training.auto_resume picks up the rolling last_model checkpoint."""
    cfg = _base_cfg(tmp_path, auto_resume=True)
    t1 = Trainer(cfg, run_id="t1")
    assert t1.start_iter == 0
    t1.train()
    assert os.path.exists(os.path.join(t1.log_path, "last_model.msgpack"))

    t2 = Trainer(_base_cfg(tmp_path, auto_resume=True), run_id="t1b")
    assert t2.start_iter > 0  # resumed, not restarted
    p1 = np.asarray(
        __import__("jax").tree_util.tree_leaves(t1.state.params)[0])
    p2 = np.asarray(
        __import__("jax").tree_util.tree_leaves(t2.state.params)[0])
    np.testing.assert_array_equal(p1, p2)


def test_pad_val_batch_to_mesh_multiple():
    """Ragged final val batches are padded to the next multiple of the mesh
    size, not to val_batch_size (which may be smaller than the mesh — e.g.
    vbs=4 on 8 devices). Padded labels carry ignore=250."""
    from improving_segmentation_with_selfsupervised_depth_tpu.engine.trainer import (
        _pad_val_batch,
    )
    batch = {
        "img": np.zeros((5, 4, 4, 3), np.float32),
        "lbl": np.ones((5, 4, 4), np.int32),
        "filename": [f"f{i}" for i in range(5)],
    }
    n_real, mesh_size = 5, 8
    target = -(-n_real // mesh_size) * mesh_size
    assert target == 8
    out = _pad_val_batch(batch, target)
    assert out["img"].shape[0] == 8
    assert out["lbl"].shape[0] == 8
    assert len(out["filename"]) == 8
    assert (out["lbl"][n_real:] == 250).all()
    assert (out["lbl"][:n_real] == 1).all()
    # already-shardable batch is returned unchanged
    same = _pad_val_batch(batch, 5)
    assert same["img"].shape[0] == 5
