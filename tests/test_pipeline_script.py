"""End-to-end dry run of tools/cityscapes_pipeline.sh against a fake tree.

Executes the ACTUAL shell script (preprocess -> checkpoint staging -> 2-iter
exp-210 training with validation) so a typo in the one-command real-data
path can't survive to the day real data shows up. The fake raw tree is
full-resolution Cityscapes geometry (2048x1024) with 2 stems per split;
SDT_SMOKE=1 routes step 3 through the fake-data smoke overrides
(cli/test_experiments_cli.py `fake_data_overrides`).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture
def fake_raw_cityscapes(tmp_path):
    """Raw-package layout: leftImg8bit/ gtFine/ leftImg8bit_sequence/ at
    2048x1024 (compressible flat-ish content so PNG writes stay small)."""
    root = tmp_path / "cityscapes"
    city = "faketown"
    rng = np.random.default_rng(0)
    for split in ["train", "val"]:
        img_dir = root / "leftImg8bit" / split / city
        seq_dir = root / "leftImg8bit_sequence" / split / city
        ann_dir = root / "gtFine" / split / city
        for d in (img_dir, seq_dir, ann_dir):
            d.mkdir(parents=True)
        for i in range(2):
            stem = f"{city}_{i:06d}_000019"
            # blocky image: upscale 16x32 noise so PNG compresses well
            small = rng.integers(0, 255, (16, 32, 3), dtype=np.uint8)
            arr = small.repeat(64, axis=0).repeat(64, axis=1)
            img = Image.fromarray(arr)
            img.save(img_dir / f"{stem}_leftImg8bit.png")
            for off in (-1, 0, 1):
                seq_stem = f"{city}_{i:06d}_{19 + off:06d}"
                img.save(seq_dir / f"{seq_stem}_leftImg8bit.png")
            lbl = rng.choice([7, 8, 26, 0, 255], size=(64, 128)).astype(np.uint8)
            lbl = lbl.repeat(16, axis=0).repeat(16, axis=1)
            Image.fromarray(lbl, "L").save(ann_dir / f"{stem}_gtFine_labelIds.png")
    return root


def test_pipeline_script_end_to_end(fake_raw_cityscapes, tmp_path):
    out_dir = tmp_path / "results"
    env = dict(os.environ)
    env.update({
        "CITYSCAPES_DIR": str(fake_raw_cityscapes),
        "SDT_OUT_DIR": str(out_dir),
        "SDT_DISPATCH_DIR": str(tmp_path / "dispatch"),
        "SDT_SMOKE": "1",
        # single CPU device keeps the subprocess light; the mesh path has its
        # own tests
        "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
        "JAX_PLATFORMS": "cpu",
        "PALLAS_AXON_POOL_IPS": "",
    })
    proc = subprocess.run(
        ["bash", os.path.join(REPO, "tools", "cityscapes_pipeline.sh"), "210"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1500)
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]

    # step 1 produced the downscaled trees the loaders expect
    for tree in ["leftImg8bit_small", "leftImg8bit_sequence_small",
                 "leftImg8bit_tiny"]:
        assert (fake_raw_cityscapes / tree).is_dir(), tree
    # the preprocessor re-encodes to JPEG q98 like the reference
    small = next((fake_raw_cityscapes / "leftImg8bit_small").rglob("*.jpg"))
    assert Image.open(small).size == (1024, 512)
    tiny = next((fake_raw_cityscapes / "leftImg8bit_tiny").rglob("*.jpg"))
    assert Image.open(tiny).size == (512, 256)

    # step 3 trained 2 iters and validated: metrics.jsonl records both
    metrics_files = list(out_dir.rglob("metrics.jsonl"))
    assert metrics_files, f"no metrics.jsonl under {out_dir}: {proc.stdout[-2000:]}"
    tags = set()
    for line in metrics_files[0].read_text().splitlines():
        tags.add(json.loads(line)["tag"].split("/")[0])
    assert "training" in tags and "validation" in tags, tags
