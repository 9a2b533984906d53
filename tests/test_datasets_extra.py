"""CamVid + Mapillary dataset pipelines over fake on-disk trees."""

import json

import numpy as np
import pytest
from PIL import Image

from improving_segmentation_with_selfsupervised_depth_tpu.data.camvid import CamvidDataset
from improving_segmentation_with_selfsupervised_depth_tpu.data.mapillary import (
    MapillaryVistasDataset,
)


@pytest.fixture
def fake_camvid(tmp_path):
    root = tmp_path / "camvid"
    rng = np.random.default_rng(0)
    for split in ["train", "test"]:
        (root / split).mkdir(parents=True)
        (root / (split + "annot")).mkdir(parents=True)
        for i in range(3):
            img = Image.fromarray(rng.integers(0, 255, (360, 480, 3), dtype=np.uint8))
            img.save(root / split / f"{i:04d}.png")
            lbl = rng.integers(0, 12, (360, 480)).astype(np.uint8)
            Image.fromarray(lbl, "L").save(root / (split + "annot") / f"{i:04d}.png")
    return root


def test_camvid_dataset(fake_camvid):
    ds = CamvidDataset(root=str(fake_camvid), split="train", img_size=(360, 480),
                       crop_h=128, crop_w=128, frame_idxs=(0,), num_scales=1,
                       load_sequence=False,
                       augmentations={"random_horizontal_flip": 0.5})
    assert ds.n_classes == 12
    item = ds[0]
    assert item["color_0_0"].shape == (128, 128, 3)
    lbl = item["lbl"]
    # class 11 (unlabelled) remapped to ignore 250
    assert set(np.unique(lbl)) <= set(range(11)) | {250}
    test_ds = CamvidDataset(root=str(fake_camvid), split="test",
                            img_size=(360, 480), frame_idxs=(0,), num_scales=1,
                            load_sequence=False)
    assert len(test_ds) == 3
    col = ds.decode_segmap_tocolor(np.array([[0, 3]]))
    assert col.shape == (1, 2, 3)


@pytest.fixture
def fake_mapillary(tmp_path):
    root = tmp_path / "mapillary"
    rng = np.random.default_rng(0)
    colors = [[i * 3 % 256, (i * 7 + 1) % 256, (i * 11 + 2) % 256] for i in range(66)]
    config = {"labels": [{"readable": f"class{i}", "color": colors[i]}
                         for i in range(66)]}
    root.mkdir()
    with open(root / "config.json", "w") as f:
        json.dump(config, f)
    for split in ["train", "validation"]:
        (root / split / "images").mkdir(parents=True)
        (root / split / "labels").mkdir(parents=True)
        for i in range(2):
            img = Image.fromarray(rng.integers(0, 255, (512, 768, 3), dtype=np.uint8))
            img.save(root / split / "images" / f"{i}.jpg")
            ids = rng.integers(0, 66, (512, 768))
            rgb = np.asarray(colors, np.uint8)[ids]
            Image.fromarray(rgb).save(root / split / "labels" / f"{i}.png")
    return root


def test_mapillary_dataset(fake_mapillary):
    ds = MapillaryVistasDataset(root=str(fake_mapillary), split="train",
                                img_size=(512, 704), crop_h=128, crop_w=128,
                                frame_idxs=(0,), num_scales=1, load_sequence=False)
    assert ds.n_classes == 65
    item = ds[0]
    assert item["color_0_0"].shape == (128, 128, 3)
    lbl = item["lbl"]
    assert set(np.unique(lbl)) <= set(range(65)) | {250}
