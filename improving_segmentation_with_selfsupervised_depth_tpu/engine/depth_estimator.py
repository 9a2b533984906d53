"""Offline pseudo-depth generation (reference loader/depth_estimator.py:15-93).

Builds a seg-less, pose-less depth model from the configured SDE checkpoint,
runs it over the train+val splits in batches on device, and writes per-image
min-max-normalized disparity PNGs to
`generated_depth_dir/...` (idempotent: existing files are skipped).

The 8-bit PNG quantization of the pseudo-depth is load-bearing in the
reference (SURVEY §7.6) and is reproduced exactly (uint8 round-trip).
"""

from __future__ import annotations

import os
from copy import deepcopy
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from ..config import MachineConfig
from ..data.loader import DataLoader
from ..data.registry import build_loader
from ..models import build_model
from ..ops.photometric import key_of
from .checkpoints import apply_pretraining


def decoder_variant(cfg: Dict[str, Any], dec: int, crop) -> Dict[str, Any]:
    """Decoder preset shared with the experiment generator
    (reference experiments.py:8-30). Returns (cfg, load_backbone)."""
    cfg["model"]["replace_stride_with_dilation"] = [False, False, True]
    if dec in (5, 6):
        cfg["model"]["depth_args"] = {
            "intermediate_aspp": True,
            "aspp_rates": [6, 12, 18],
            "num_ch_dec": [64, 128, 128, 256, 256],
            "max_scale_size": list(crop),
        }
        load_backbone = dec == 6
    elif dec == 9:
        cfg["model"]["depth_args"] = {
            "intermediate_aspp": True,
            "aspp_rates": [6, 12, 18],
            "num_ch_dec": [64, 64, 128, 128, 256],
            "batch_norm": True,
            "max_scale_size": list(crop),
        }
        load_backbone = False
    else:
        raise NotImplementedError(dec)
    return cfg, load_backbone


# The semantic contract for turning an experiment config into its depth
# teacher (reference loader/depth_estimator.py:15-40), as data: section ->
# {key: value}, where the _DROP sentinel removes the key. The teacher is a
# pose-free, seg-less, full-image (no crop/augment) depth-only model.
_DROP = object()
_TEACHER_OVERRIDES: Dict[str, Dict[str, Any]] = {
    "model": {
        "arch": "joint_segmentation_depth",
        "segmentation_name": None,
        "disable_monodepth": False,
        "disable_pose": True,
    },
    "data": {
        "augmentations": {},
        "crop_h": _DROP,
        "crop_w": _DROP,
    },
}


def _teacher_cfg(cfg: Dict[str, Any]) -> Dict[str, Any]:
    """Apply _TEACHER_OVERRIDES, then point both backbone and depth
    pretraining at the single configured weight source (exactly one of
    `data.depth_teacher` / `model.depth_estimator_weights`)."""
    cfg = deepcopy(cfg)
    for section, overrides in _TEACHER_OVERRIDES.items():
        for key, value in overrides.items():
            if value is _DROP:
                cfg[section].pop(key, None)
            else:
                cfg[section][key] = value

    teacher = cfg["data"].get("depth_teacher")
    own = cfg["model"].get("depth_estimator_weights")
    assert not (teacher is not None and own is not None), \
        "depth_teacher and depth_estimator_weights are mutually exclusive"
    if teacher is not None:
        # external teacher checkpoints are always the r101/dec6 SDE geometry
        cfg["model"]["backbone_name"] = "resnet101"
        cfg, _ = decoder_variant(cfg, 6, (512, 512))
    source = teacher if teacher is not None else own
    if source is not None:
        for key in ("backbone_pretraining", "depth_pretraining"):
            cfg["model"][key] = source
    # with no explicit source the config must already carry one consistent
    # pretraining pair (reference asserts the same invariant)
    assert cfg["model"]["depth_pretraining"] == cfg["model"]["backbone_pretraining"]
    return cfg


class DepthEstimator:
    def __init__(self, cfg: Dict[str, Any]):
        cfg = _teacher_cfg(cfg)
        self.cfg = cfg
        self.depth_dir = cfg["data"]["generated_depth_dir"]

        data_cfg = dict(cfg["data"])
        data_cfg.update({"restrict_to_subset": None, "generated_depth_dir": None})
        self.train_ds = build_loader(data_cfg, "train", load_labels=False,
                                     load_sequence=False)
        self.val_ds = build_loader(data_cfg, data_cfg.get("val_split", "val"),
                                   load_labels=False, load_sequence=False)
        self.n_classes = self.train_ds.n_classes

        self.model = build_model(cfg["model"], self.n_classes)
        self._apply = None

    def build_filename(self, subname: str) -> str:
        return os.path.join(self.depth_dir, subname.replace(".jpg", ".png"))

    def _init_model(self, example):
        rng = jax.random.PRNGKey(0)
        # initialize via the pose-free depth path (consumes color_0_0 only)
        variables = self.model.init({"params": rng, "dropout": rng}, example,
                                    method=self.model.predict_test_disp)
        params, batch_stats = variables["params"], variables.get("batch_stats", {})
        params, batch_stats = apply_pretraining(
            self.cfg["model"], params, batch_stats,
            getattr(MachineConfig, "DOWNLOAD_MODEL_DIR", None))
        self._vars = {"params": params, "batch_stats": batch_stats}
        self._apply = jax.jit(
            lambda v, b: self.model.apply(v, b, train=False,
                                          method=self.model.predict_test_disp))

    def prepare_depth_estimates(self) -> None:
        batch_size = 4
        for ds in (self.train_ds, self.val_ds):
            loader = DataLoader(ds, batch_size, shuffle=False, drop_last=False,
                                num_workers=self.cfg["training"].get("n_workers", 2))
            for batch in loader:
                if all(os.path.isfile(self.build_filename(f)) for f in batch["filename"]):
                    continue
                dev = {key_of("color", 0, 0): jnp.asarray(batch[key_of("color", 0, 0)])}
                if self._apply is None:
                    self._init_model(dev)
                disp = np.asarray(self._apply(self._vars, dev)["disp_0"])[..., 0]
                for subname, d in zip(batch["filename"], disp):
                    filename = self.build_filename(subname)
                    os.makedirs(os.path.dirname(filename), exist_ok=True)
                    dmin, dmax = d.min(), d.max()
                    norm = (d - dmin) / max(dmax - dmin, 1e-12)
                    img = Image.fromarray((norm * 255).round().astype(np.uint8), "L")
                    if not os.path.isfile(filename):
                        img.save(filename)
