#!/usr/bin/env python
"""Top-level label-selection entry point (`python label_selection.py --config ...`)."""

import argparse

import yaml

from improving_segmentation_with_selfsupervised_depth_tpu.label_selection import (
    label_selection_main,
)

if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="config")
    parser.add_argument("--config", nargs="?", type=str,
                        default="configs/cityscapes_joint.yml")
    parser.add_argument("--machine", type=str, default="ws")
    args = parser.parse_args()
    with open(args.config) as fp:
        cfg = yaml.safe_load(fp)
    cfg["machine"] = args.machine
    label_selection_main(cfg)
