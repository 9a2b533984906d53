"""Data pipeline tests: synthetic + an on-disk fake Cityscapes tree."""

import os

import numpy as np
import pytest
from PIL import Image

from improving_segmentation_with_selfsupervised_depth_tpu.data.cityscapes import (
    CityscapesDataset,
    encode_segmap,
)
from improving_segmentation_with_selfsupervised_depth_tpu.data.loader import (
    DataLoader,
    collate,
    infinite_iterator,
)
from improving_segmentation_with_selfsupervised_depth_tpu.data.registry import build_loader
from improving_segmentation_with_selfsupervised_depth_tpu.data.synthetic_dataset import (
    SyntheticDataset,
)
from improving_segmentation_with_selfsupervised_depth_tpu.data.utils import restrict_to_subset


def test_encode_segmap_mapping():
    mask = np.array([[7, 8, 0], [33, 255, 26]], dtype=np.int32)
    enc = encode_segmap(mask)
    assert enc[0, 0] == 0 and enc[0, 1] == 1  # road, sidewalk
    assert enc[1, 0] == 18  # bicycle
    assert enc[0, 2] == 250 and enc[1, 1] == 250  # void -> ignore


def test_restrict_to_subset_random_and_fixed():
    files = [{"idx": i, "name": f"f{i}", "labeled": True} for i in range(10)]
    lab = restrict_to_subset([dict(f) for f in files], "random", 3, 42, True, False)
    assert len(lab) == 3 and all(f["labeled"] for f in lab)
    both = restrict_to_subset([dict(f) for f in files], "random", 3, 42, True, True)
    assert len(both) == 10
    assert sum(f["labeled"] for f in both) == 3
    # same seed -> same subset (bit-compatible with reference np.random path)
    lab2 = restrict_to_subset([dict(f) for f in files], "random", 3, 42, True, False)
    assert [f["idx"] for f in lab] == [f["idx"] for f in lab2]
    fixed = restrict_to_subset([dict(f) for f in files], "fixed", 2, 0, True, False,
                               subset=[1, 5])
    assert [f["idx"] for f in fixed] == [1, 5]


def test_synthetic_dataset_contract():
    ds = SyntheticDataset(n_samples=6, split="train", img_size=(64, 96),
                          frame_idxs=(0, -1, 1), num_scales=4, load_onehot=True,
                          restrict_dict={"mode": "random", "n_subset": 3},
                          load_unlabeled=True, load_labeled=True)
    item = ds[0]
    assert item["color_0_0"].shape == (64, 96, 3)
    assert item["color_aug_-1_0"].shape == (64, 96, 3)
    assert item["K_0"].shape == (4, 4) and item["inv_K_3"].shape == (4, 4)
    assert item["lbl"].shape == (64, 96)
    assert item["onehot_lbl"].shape == (64, 96, 19)
    assert item["pseudo_depth"].shape == (64, 96, 1)


def test_dataloader_batches_and_infinite():
    ds = SyntheticDataset(n_samples=10, split="train", img_size=(64, 96),
                          frame_idxs=(0,), num_scales=1)
    dl = DataLoader(ds, batch_size=4, shuffle=True, drop_last=True, num_workers=2)
    assert len(dl) == 2
    batches = list(dl)
    assert len(batches) == 2
    assert batches[0]["color_0_0"].shape == (4, 64, 96, 3)
    assert isinstance(batches[0]["filename"], list)
    it = infinite_iterator(dl)
    for _ in range(5):
        b = next(it)
        assert b["lbl"].shape == (4, 64, 96)


@pytest.fixture
def fake_cityscapes(tmp_path):
    """Minimal on-disk Cityscapes tree at tiny (256x512) resolution."""
    root = tmp_path / "cs"
    city = "faketown"
    rng = np.random.default_rng(0)
    for split in ["train", "val"]:
        img_dir = root / "leftImg8bit_tiny" / split / city
        seq_dir = root / "leftImg8bit_sequence_tiny" / split / city
        ann_dir = root / "gtFine" / split / city
        for d in (img_dir, seq_dir, ann_dir):
            d.mkdir(parents=True)
        for i in range(3):
            stem = f"{city}_{i:06d}_000019"
            img = Image.fromarray(rng.integers(0, 255, (256, 512, 3), dtype=np.uint8).astype(np.uint8))
            img.save(img_dir / f"{stem}_leftImg8bit.png")
            for off in (-1, 0, 1):
                seq_stem = f"{city}_{i:06d}_{19 + off:06d}"
                img.save(seq_dir / f"{seq_stem}_leftImg8bit.png")
            lbl = rng.choice([7, 8, 26, 0, 255], size=(256, 512)).astype(np.uint8)
            Image.fromarray(lbl, "L").save(ann_dir / f"{stem}_gtFine_labelIds.png")
    return root


def test_cityscapes_dataset_end_to_end(fake_cityscapes):
    ds = CityscapesDataset(
        root=str(fake_cityscapes), split="train", img_size=(256, 512),
        crop_h=128, crop_w=128, frame_idxs=(0, -1, 1), num_scales=4,
        augmentations={"random_horizontal_flip": 0.5, "color_aug": True},
    )
    assert len(ds) == 3
    item = ds[0]
    assert item["color_0_0"].shape == (128, 128, 3)
    assert item["color_0_3"].shape == (16, 16, 3)
    assert item["color_aug_1_0"].shape == (128, 128, 3)
    assert item["lbl"].shape == (128, 128)
    valid = item["lbl"][item["lbl"] != 250]
    assert valid.size == 0 or valid.max() < 19
    K = item["K_0"]
    assert K[0, 0] == pytest.approx(2262.52)
    assert np.allclose(K @ item["inv_K_0"], np.eye(4), atol=1e-3)


def test_cityscapes_via_registry(fake_cityscapes):
    cfg = {
        "dataset": "cityscapes",
        "path": str(fake_cityscapes),
        "img_size": (256, 512),
        "frame_ids": (0, -1, 1),
        "num_scales": 4,
        "crop_h": 128, "crop_w": 128,
        "augmentations": {"random_horizontal_flip": 0.5},
        "restrict_to_subset": {"mode": "random", "n_subset": 2},
    }
    ds = build_loader(cfg, "train")
    assert len(ds) == 2
    val = build_loader(cfg, "val")
    assert len(val) == 3
    item = val[0]
    assert item["color_0_0"].shape == (256, 512, 3)


def test_color_full_keys_for_uncropped_pose(fake_cityscapes):
    """provide_uncropped_for_pose path: full-frame keys emitted alongside crops
    (implemented properly here; dormant in the reference)."""
    ds = CityscapesDataset(
        root=str(fake_cityscapes), split="train", img_size=(256, 512),
        crop_h=128, crop_w=128, frame_idxs=(0, -1, 1), num_scales=1,
        load_color_full=True, augmentations={"color_aug": True},
    )
    item = ds[0]
    assert item["color_0_0"].shape == (128, 128, 3)
    assert item["color_full_0_0"].shape == (256, 512, 3)
    assert item["color_full_aug_-1_0"].shape == (256, 512, 3)
