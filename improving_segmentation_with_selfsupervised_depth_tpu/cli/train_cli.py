"""Train CLI (reference train.py:966-986): `--config <yaml> --machine ws`."""

from __future__ import annotations

import argparse
from datetime import datetime

import yaml

from ..config import MachineConfig
from ..engine.trainer import train_main


def main(argv=None):
    parser = argparse.ArgumentParser(description="config")
    parser.add_argument("--config", nargs="?", type=str,
                        default="configs/cityscapes_joint.yml",
                        help="Configuration file to use")
    parser.add_argument("--machine", type=str, default="ws")
    args = parser.parse_args(argv)

    with open(args.config) as fp:
        cfg = yaml.safe_load(fp)
    cfg["machine"] = args.machine
    MachineConfig(args.machine)
    run_id = cfg.get("name", "run") + "_" + datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
    train_main(cfg, run_id=run_id)


if __name__ == "__main__":
    main()
