"""Experiment runner (reference run_experiments.py:15-105): expand variant
grid, dump per-trial YAML, dispatch sequentially to train_main or
label_selection_main, catch-and-continue on failure."""

from __future__ import annotations

import argparse
import os
import traceback
from datetime import datetime

import yaml

from ..config import MachineConfig
from ..config.experiments import generate_experiment_cfgs
from ..config.grid import expand_grid
from ..engine.trainer import train_main
from ..label_selection import label_selection_main


def run_experiments(base_cfg, exp_id, machine="ws", runs="all", dry=False,
                    config_name="cityscapes_joint", overrides=None, strict=False):
    """`strict=True` re-raises trial failures instead of the reference's
    catch-and-continue dispatch — used by smoke/CI runs where a silent trial
    failure would defeat the check."""
    cfgs = generate_experiment_cfgs(base_cfg, exp_id)
    experiment_name = f"{config_name}_{exp_id}"
    run_id = experiment_name + "_" + datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
    out_dir = os.path.expandvars(os.path.join(
        os.environ.get("SDT_DISPATCH_DIR", "results/dispatcher"), run_id))
    os.makedirs(out_dir, exist_ok=True)

    i = 0
    for cfg_with_grid in cfgs:
        for cfg in expand_grid(cfg_with_grid):
            trial_i = i
            i += 1
            if runs != "all" and trial_i not in runs:
                continue
            tag = cfg.get("general", {}).get("tag", f"trial{trial_i}")
            print(f"Dispatch job {tag}")
            cfg["name"] = datetime.now().strftime("%Y-%m-%d_%H-%M-%S") + tag
            cfg["machine"] = machine
            cfg["training"]["log_path"] = os.path.join(
                cfg["training"]["log_path"], experiment_name)
            if overrides:
                overrides(cfg)
            with open(os.path.join(out_dir, f"trial_{trial_i}.yaml"), "w") as of:
                yaml.safe_dump(cfg, of, default_flow_style=False)
            if dry:
                continue
            try:
                if cfg.get("main") == "label_selection":
                    label_selection_main(cfg)
                else:
                    train_main(cfg, run_id=cfg["name"])
            except Exception:
                if strict:
                    raise
                print(traceback.format_exc())
                print("Continue with next experiment.")


def parse_runs(run_arg: str):
    if run_arg == "all":
        return "all"
    if "-" in run_arg:
        low, up = run_arg.split("-")
        return list(range(int(low), int(up)))
    return [int(v) for v in run_arg.split(",")]


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", nargs="?", type=str,
                        default="configs/cityscapes_joint.yml",
                        help="Base config file to use")
    parser.add_argument("--exp", nargs="?", type=int, required=True,
                        help="Experiment id (210 | 211 | 212)")
    parser.add_argument("--dry", action="store_true")
    parser.add_argument("--machine", type=str, default="ws")
    parser.add_argument("--run", type=str, default="all",
                        help="Run index/range within the experiment")
    args = parser.parse_args(argv)

    MachineConfig(args.machine)
    with open(args.config) as fp:
        base_cfg = yaml.safe_load(fp)
    config_name = os.path.basename(args.config).split(".")[0]
    run_experiments(base_cfg, args.exp, machine=args.machine,
                    runs=parse_runs(args.run), dry=args.dry,
                    config_name=config_name)


if __name__ == "__main__":
    main()
