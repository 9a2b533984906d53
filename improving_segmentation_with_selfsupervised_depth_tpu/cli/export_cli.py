"""Export a trained run directory to a self-contained serving artifact.

    python -m improving_segmentation_with_selfsupervised_depth_tpu.cli.export_cli \
        --model <run-dir> --height 512 --width 512 --out model.hlo [--platform tpu]

The artifact is a serialized StableHLO module with the checkpoint weights
baked in (engine/export.py); load with `engine.export.load_exported` — no
model or config code needed at serving time.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import optax
import yaml

import jax
import jax.numpy as jnp

from ..config import MachineConfig
from ..engine.checkpoints import load_resume
from ..engine.export import export_inference
from ..engine.state import create_train_state
from ..models import build_model
from ..ops.photometric import key_of


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", required=True,
                    help="Run dir containing best_model.msgpack + cfg.yml")
    ap.add_argument("--out", required=True, help="Output artifact path")
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--platform", default=None,
                    help="Target platform (tpu/cpu); default = current backend")
    ap.add_argument("--machine", default="ws")
    args = ap.parse_args(argv)

    with open(os.path.join(args.model, "cfg.yml")) as fp:
        cfg = yaml.safe_load(fp)
    MachineConfig(cfg.get("machine", args.machine))
    cfg["model"]["disable_pose"] = True

    n_classes = cfg["data"].get("n_classes", 19)
    dtype = jnp.bfloat16 if cfg["training"].get("amp", False) else jnp.float32
    model = build_model(cfg["model"], n_classes, dtype=dtype)

    example = {key_of("color_aug", 0, 0):
               jnp.zeros((1, args.height, args.width, 3), jnp.float32),
               key_of("color", 0, 0):
               jnp.zeros((1, args.height, args.width, 3), jnp.float32)}
    state = create_train_state(model, jax.random.PRNGKey(0), example,
                               optax.identity())
    ckpt = os.path.join(args.model, "best_model.msgpack")
    state, _, _ = load_resume(ckpt, state, load_model_only=True)

    data = export_inference(
        model, {"params": state.params, "batch_stats": state.batch_stats},
        args.height, args.width, batch_size=args.batch,
        platforms=(args.platform,) if args.platform else None)
    with open(args.out, "wb") as f:
        f.write(data)
    print(f"exported {len(data) / 1e6:.1f} MB -> {args.out}")


if __name__ == "__main__":
    main()
