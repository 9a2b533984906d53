"""Smoke-test runner (reference test_experiments.py:35-78): run every variant
of experiments 210/211/212 with truncated budgets (2 train iters, immediate
validation) against real or synthetic data."""

from __future__ import annotations

import argparse

import yaml

from ..config import MachineConfig
from .run_experiments_cli import run_experiments


def smoke_overrides(cfg):
    """Truncated budgets (reference test_experiments.py:63-73)."""
    cfg["training"]["print_interval"] = 1
    cfg["training"]["val_interval"] = {"0": 1}
    cfg["training"]["train_iters"] = 2
    cfg["training"]["n_tensorboard_imgs"] = 2
    if "label_selection" in cfg:
        cfg["label_selection"]["label_steps"] = [25, 50]
        cfg["label_selection"]["train_iters"] = [2, 2]
        if "max_iter" in (cfg["training"].get("lr_schedule") or {}):
            cfg["training"]["lr_schedule"]["max_iter"] = 2


def synthetic_overrides(cfg):
    """Redirect a config to the in-memory synthetic dataset for hardware-only
    smoke tests without Cityscapes on disk."""
    smoke_overrides(cfg)
    cfg["data"].update({"dataset": "synthetic", "n_samples": 8, "path": None})
    if cfg["data"].get("restrict_to_subset"):
        cfg["data"]["restrict_to_subset"] = {"mode": "random", "n_subset": 4}
    cfg["monodepth_options"].update({"height": 64, "width": 96,
                                     "crop_h": 64, "crop_w": 64})
    cfg["data"].pop("depth_teacher", None)
    cfg["model"]["backbone_name"] = "resnet18"
    cfg["model"]["backbone_pretraining"] = "none"
    cfg["model"]["depth_pretraining"] = "none"
    cfg["model"]["pose_pretraining"] = "none"
    if cfg["model"].get("segmentation_args"):
        cfg["model"]["segmentation_args"].pop("weights", None)
    cfg["model"]["depth_estimator_weights"] = None
    if cfg.get("label_selection"):
        cfg["label_selection"]["label_steps"] = [2, 4]
        cfg["label_selection"]["train_iters"] = [2, 2]
    if cfg["training"].get("unlabeled_segmentation"):
        cfg["training"]["unlabeled_segmentation"]["depthmix_online_depth"] = True


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, default="configs/cityscapes_joint.yml")
    parser.add_argument("--machine", type=str, default="ws")
    parser.add_argument("--exps", type=str, default="210,211,212")
    parser.add_argument("--synthetic", action="store_true",
                        help="Run against the in-memory synthetic dataset")
    args = parser.parse_args(argv)

    MachineConfig(args.machine)
    with open(args.config) as fp:
        base_cfg = yaml.safe_load(fp)
    overrides = synthetic_overrides if args.synthetic else smoke_overrides
    for exp in [int(e) for e in args.exps.split(",")]:
        run_experiments(base_cfg, exp, machine=args.machine, runs="all",
                        dry=False, config_name="smoke", overrides=overrides)


if __name__ == "__main__":
    main()
