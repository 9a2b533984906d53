"""Offline pseudo-depth generation: PNG round-trip over a fake Cityscapes tree."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from improving_segmentation_with_selfsupervised_depth_tpu.config import MachineConfig
from improving_segmentation_with_selfsupervised_depth_tpu.data.synthetic import (
    make_synthetic_batch,
)
from improving_segmentation_with_selfsupervised_depth_tpu.engine.checkpoints import (
    save_monodepth_models,
)
from improving_segmentation_with_selfsupervised_depth_tpu.engine.depth_estimator import (
    DepthEstimator,
)
from improving_segmentation_with_selfsupervised_depth_tpu.models import build_model


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
        for i in range(2):
            stem = f"{city}_{i:06d}_000019"
            img = Image.fromarray(
                rng.integers(0, 255, (256, 512, 3), dtype=np.uint8).astype(np.uint8))
            img.save(img_dir / f"{stem}_leftImg8bit.png")
            for off in (-1, 0, 1):
                img.save(seq_dir / f"{city}_{i:06d}_{19 + off:06d}_leftImg8bit.png")
            lbl = rng.choice([7, 8, 26], size=(256, 512)).astype(np.uint8)
            Image.fromarray(lbl, "L").save(ann_dir / f"{stem}_gtFine_labelIds.png")
    return root


def test_depth_estimator_writes_idempotent_pngs(tmp_path, fake_cityscapes):
    # fabricate an SDE checkpoint for the estimator (r18 + default decoder)
    model_cfg = {"backbone_name": "resnet18", "segmentation_name": None,
                 "depth_args": {}, "frame_ids": [0], "disable_pose": True,
                 "disable_monodepth": False, "num_scales": 1}
    model = build_model(model_cfg, n_classes=19)
    batch = {k: jnp.asarray(v) for k, v in
             make_synthetic_batch(1, 256, 512, frame_ids=(0,), num_scales=1).items()}
    rng = jax.random.PRNGKey(0)
    v = model.init({"params": rng, "dropout": rng}, batch)
    ckpt_dir = tmp_path / "models" / "mono_test_weights"
    save_monodepth_models(str(ckpt_dir), v["params"], v.get("batch_stats", {}),
                          include_encoder=True)
    MachineConfig.DOWNLOAD_MODEL_DIR = str(tmp_path / "models")

    gen_dir = tmp_path / "generated_depth"
    cfg = {
        "seed": 42,
        "model": {"backbone_name": "resnet18", "segmentation_name": None,
                  "depth_args": {}, "disable_pose": True, "disable_monodepth": False,
                  "depth_estimator_weights": "mono_test_weights",
                  "frame_ids": [0], "num_scales": 1},
        "monodepth_options": {"frame_ids": [0], "num_scales": 1},
        "data": {"dataset": "cityscapes", "path": str(fake_cityscapes),
                 "img_size": (256, 512), "frame_ids": [0], "num_scales": 1,
                 "generated_depth_dir": str(gen_dir), "n_workers": 2,
                 "val_split": "val"},
        "training": {"n_workers": 2},
    }
    DepthEstimator(cfg).prepare_depth_estimates()

    pngs = []
    for root, _, files in os.walk(gen_dir):
        pngs.extend(os.path.join(root, f) for f in files if f.endswith(".png"))
    assert len(pngs) == 4  # 2 train + 2 val
    arr = np.asarray(Image.open(pngs[0]))
    assert arr.shape == (256, 512)
    assert arr.min() == 0 and arr.max() == 255  # min-max normalized, uint8

    # idempotent: second run keeps files (mtimes unchanged)
    mtimes = {p: os.path.getmtime(p) for p in pngs}
    DepthEstimator(cfg).prepare_depth_estimates()
    assert {p: os.path.getmtime(p) for p in pngs} == mtimes
