"""Trainer end-to-end over an on-disk fake Cityscapes tree (binds the file
pipeline, sequence frames, and the training loop together)."""

import numpy as np
import pytest
from PIL import Image

from improving_segmentation_with_selfsupervised_depth_tpu.engine.trainer import Trainer


@pytest.fixture
def fake_cityscapes(tmp_path):
    root = tmp_path / "cs"
    city = "faketown"
    rng = np.random.default_rng(0)
    for split in ["train", "val"]:
        img_dir = root / "leftImg8bit_tiny" / split / city
        seq_dir = root / "leftImg8bit_sequence_tiny" / split / city
        ann_dir = root / "gtFine" / split / city
        for d in (img_dir, seq_dir, ann_dir):
            d.mkdir(parents=True)
        for i in range(4):
            stem = f"{city}_{i:06d}_000019"
            img = Image.fromarray(
                rng.integers(0, 255, (256, 512, 3), dtype=np.uint8).astype(np.uint8))
            img.save(img_dir / f"{stem}_leftImg8bit.png")
            for off in (-1, 0, 1):
                img.save(seq_dir / f"{city}_{i:06d}_{19 + off:06d}_leftImg8bit.png")
            lbl = rng.choice([7, 8, 26, 0], size=(256, 512)).astype(np.uint8)
            Image.fromarray(lbl, "L").save(ann_dir / f"{stem}_gtFine_labelIds.png")
    return root


def test_trainer_on_fake_cityscapes_joint(tmp_path, fake_cityscapes):
    """Joint SDE + segmentation training on real files (tiny tree)."""
    cfg = {
        "seed": 42,
        "model": {
            "arch": "joint_segmentation_depth",
            "backbone_name": "resnet18",
            "segmentation_name": "joint_seg_depth_dec",
            "segmentation_args": {"layers": [9], "head_inter": False, "output_stride": 1},
            "depth_args": {},
            "disable_monodepth": False,
            "disable_pose": False,
            "backbone_pretraining": "none",
        },
        "monodepth_options": {"frame_ids": [0, -1, 1], "num_scales": 1,
                              "height": 256, "width": 512,
                              "crop_h": 64, "crop_w": 64},
        "data": {
            "dataset": "cityscapes",
            "path": str(fake_cityscapes),
            "img_size": (256, 512),
            "n_workers": 2,
            "augmentations": {"random_horizontal_flip": 0.5, "color_aug": True},
            "restrict_to_subset": {"mode": "random", "n_subset": 2},
        },
        "training": {
            "log_path": str(tmp_path / "log"),
            "train_iters": 2, "batch_size": 2, "val_batch_size": 2,
            "print_interval": 1, "val_interval": {"0": 1},
            "optimizer": {"name": "sgd", "lr": 1e-2, "momentum": 0.9},
            "lr_schedule": None,
            "segmentation_lambda": 1.0, "monodepth_lambda": 1.0,
            "save_model": False,
            "monodepth_loss": {"min_depth": 0.1, "max_depth": 100,
                               "test_min_depth": 1e-3, "test_max_depth": 80,
                               "disparity_smoothness": 1e-3},
        },
    }
    trainer = Trainer(cfg, run_id="cs")
    assert len(trainer.train_dataset) == 2  # restricted subset
    assert len(trainer.val_dataset) == 4
    final = trainer.train()
    assert final >= 1
    assert np.isfinite(trainer.mIoU)
    # validation at full 256x512 resolution ran (train at 64x64 crop)
    assert trainer.mIoU >= 0.0
