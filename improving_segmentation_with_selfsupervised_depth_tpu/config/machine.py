"""Machine-dependent path constants (reference configs/machine_config.py).

`MachineConfig("ws")` sets class attributes consumed by "MachineConfig.X"
strings in configs (expanded by `expand_cfg_vars`). Paths come from
environment variables when set, with sane defaults under ./datasets and
./results.
"""

from __future__ import annotations

import os


class MachineConfig:
    AVAIL_MACHINES = ["ws"]
    GENERATED_DEPTH_DIR: str = None
    CITYSCAPES_DIR: str = None
    CAMVID_DIR: str = None
    MAPILLARY_DIR: str = None
    LOG_DIR: str = None
    DOWNLOAD_MODEL_DIR: str = None

    def __init__(self, machine: str):
        if machine == "ws":
            base_data = os.environ.get("SDT_DATA_DIR", "datasets")
            base_out = os.environ.get("SDT_OUT_DIR", "results")
            MachineConfig.CITYSCAPES_DIR = os.environ.get(
                "CITYSCAPES_DIR", os.path.join(base_data, "cityscapes"))
            MachineConfig.CAMVID_DIR = os.environ.get(
                "CAMVID_DIR", os.path.join(base_data, "camvid"))
            MachineConfig.MAPILLARY_DIR = os.environ.get(
                "MAPILLARY_DIR", os.path.join(base_data, "mapillary"))
            MachineConfig.LOG_DIR = os.environ.get(
                "SDT_LOG_DIR", os.path.join(base_out, "logs"))
            MachineConfig.GENERATED_DEPTH_DIR = os.environ.get(
                "SDT_GEN_DEPTH_DIR", os.path.join(base_out, "generated_depth"))
            MachineConfig.DOWNLOAD_MODEL_DIR = os.environ.get(
                "SDT_MODEL_DIR", os.path.join(base_out, "models"))
        else:
            raise NotImplementedError(f"Unknown machine {machine}")
