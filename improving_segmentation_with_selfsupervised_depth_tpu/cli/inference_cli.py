"""Inference CLI (reference inference.py): load a checkpoint dir
(`best_model.msgpack` + `cfg.yml`), run seg+depth over an image directory and
save image / _depth.png / _label.png per input file."""

from __future__ import annotations

import argparse
import os
from datetime import datetime
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
import yaml
from PIL import Image

from ..config import MachineConfig, expand_cfg_vars
from ..data.loader import DataLoader
from ..data.registry import build_loader
from ..engine.checkpoints import load_resume
from ..engine.state import create_train_state
from ..engine.train_steps import step_config_from_cfg
from ..models import build_model
from ..ops import photometric
from ..ops.photometric import key_of
from ..utils import set_seeds
import optax


class Inference:
    """reference inference.py:20-116."""

    def __init__(self, cfg: Dict[str, Any], logdir: str, run_id: str):
        if "monodepth_options" in cfg:
            for section in ("data", "model"):
                cfg[section].update(cfg["monodepth_options"])
            cfg["training"].setdefault("monodepth_loss", {}).update(cfg["monodepth_options"])
        set_seeds(cfg.get("seed", 1337))
        if cfg["data"].get("dataset_seed") == "same":
            cfg["data"]["dataset_seed"] = cfg.get("seed", 1337)
        self.cfg = cfg
        self.logdir = logdir
        cfg["data"]["generated_depth_dir"] = None

        self.val_dataset = build_loader(cfg["data"], "val", load_labels=False,
                                        load_sequence=False)
        self.n_classes = self.val_dataset.n_classes
        self.val_loader = DataLoader(
            self.val_dataset, cfg["training"].get("val_batch_size", 2),
            shuffle=False, drop_last=False,
            num_workers=cfg["data"].get("n_workers", 2))

        dtype = jnp.bfloat16 if cfg["training"].get("amp", False) else jnp.float32
        self.model = build_model(cfg["model"], self.n_classes, dtype=dtype)
        self.step_cfg = step_config_from_cfg(cfg)

        example = {k: jnp.asarray(np.asarray(v)) for k, v in
                   next(iter(self.val_loader)).items() if k != "filename"}
        rng = jax.random.PRNGKey(0)
        self.state = create_train_state(self.model, rng, example, optax.identity())
        if cfg["training"].get("resume"):
            path = cfg["training"]["resume"]
            if os.path.isfile(path):
                self.state, _, _ = load_resume(path, self.state, load_model_only=True)
            else:
                print(f"WARNING: load_resume - {path} not found")

        variables = {"params": self.state.params, "batch_stats": self.state.batch_stats}
        model = self.model
        scfg = self.step_cfg

        # spatial partitioning: shard the image H axis over `spatial_shards`
        # devices (GSPMD conv halo exchange over ICI) so full-resolution
        # frames fit where a single chip's HBM would not — a multi-chip
        # capability beyond the single-GPU reference (parallel/spatial.py)
        self._spatial_mesh = None
        n_sp = int(cfg["training"].get("spatial_shards", 0) or 0)
        if n_sp > 1 and len(jax.devices()) % n_sp == 0:
            from ..parallel.spatial import spatial_mesh

            self._spatial_mesh = spatial_mesh(n_sp)
            variables = jax.device_put(
                variables, jax.sharding.NamedSharding(
                    self._spatial_mesh, jax.sharding.PartitionSpec()))

        @jax.jit
        def forward(batch):
            out = model.apply(variables, batch, train=False, use_pose=False)
            if not scfg.disable_monodepth:
                out = photometric.generate_depth_test_pred(
                    out, scales=scfg.scales, test_min_depth=scfg.test_min_depth,
                    test_max_depth=scfg.test_max_depth)
            return out

        self._forward = forward

    def run(self):
        for batch in self.val_loader:
            b = {k: jnp.asarray(np.asarray(v)) for k, v in batch.items()
                 if k != "filename"}
            if self._spatial_mesh is not None:
                from ..parallel.spatial import shard_batch_spatial

                b = shard_batch_spatial(b, self._spatial_mesh)
            outputs = self._forward(b)
            images = np.asarray(b[key_of("color_aug", 0, 0)])
            if self.cfg["training"].get("segmentation_lambda", 1.0) > 0 and \
                    "semantics" in outputs:
                preds = np.argmax(np.asarray(outputs["semantics"], np.float32), axis=-1)
            else:
                preds = [None] * images.shape[0]
            disps = (np.asarray(outputs["disp_0"], np.float32)
                     if "disp_0" in outputs else [None] * images.shape[0])

            for filename, img, seg, depth in zip(batch["filename"], images, preds, disps):
                fn = os.path.join(self.logdir, filename)
                os.makedirs(os.path.dirname(fn), exist_ok=True)
                stem = fn[:-4] if fn.lower().endswith((".jpg", ".png")) else fn
                Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(
                    fn if fn.lower().endswith((".jpg", ".png")) else fn + ".png")
                if depth is not None:
                    Image.fromarray(
                        (np.clip(depth[..., 0], 0, 1) * 255).astype(np.uint8), "L"
                    ).save(stem + "_depth.png")
                if seg is not None:
                    col = self.val_dataset.decode_segmap_tocolor(seg)
                    Image.fromarray((col * 255).astype(np.uint8)).save(stem + "_label.png")


def inference_main(cfg: Dict[str, Any]):
    MachineConfig(cfg.get("machine", "ws"))
    run_id = datetime.now().strftime("%Y-%m-%d_%H-%M-%S-%f")
    cfg["name"] = "inference" + run_id
    cfg["training"]["log_path"] = os.path.join(cfg["training"]["log_path"], cfg["name"])
    expand_cfg_vars(cfg)
    logdir = cfg["training"]["log_path"]
    os.makedirs(logdir, exist_ok=True)
    with open(os.path.join(logdir, "cfg.yml"), "w") as fp:
        yaml.safe_dump(cfg, fp)
    Inference(cfg, logdir, run_id).run()


def main(argv=None):
    parser = argparse.ArgumentParser(description="config")
    parser.add_argument("--model", type=str, required=True,
                        help="Model dir containing best_model.msgpack + cfg.yml")
    parser.add_argument("--data", type=str,
                        default="MachineConfig.CITYSCAPES_DIR/leftImg8bit_small/val/")
    parser.add_argument("--machine", type=str, default="ws")
    parser.add_argument("--spatial-shards", type=int, default=0,
                        help="Shard the image H axis over this many devices "
                             "(GSPMD halo exchange) for high-res inference")
    args = parser.parse_args(argv)

    with open(os.path.join(args.model, "cfg.yml")) as fp:
        cfg = yaml.safe_load(fp)
    cfg["machine"] = args.machine
    cfg["data"]["dataset"] = "inference"
    cfg["data"]["path"] = args.data
    cfg["model"]["disable_pose"] = True
    cfg["training"]["log_path"] = "MachineConfig.LOG_DIR"
    cfg["training"]["resume"] = os.path.join(args.model, "best_model.msgpack")
    cfg["training"]["spatial_shards"] = args.spatial_shards
    inference_main(cfg)


if __name__ == "__main__":
    main()
