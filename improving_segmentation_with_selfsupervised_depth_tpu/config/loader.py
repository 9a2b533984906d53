"""YAML config loading, `MachineConfig.X` / `$ENV` expansion, and the shared
monodepth_options merge (reference train.py:156-160, 926-936)."""

from __future__ import annotations

import os
from typing import Any, Dict

import yaml

from .machine import MachineConfig


def expand_cfg_vars(cfg: Dict[str, Any]) -> None:
    """In-place expansion of 'MachineConfig.X' prefixes and $ENV vars in all
    string values (reference train.py:926-936)."""
    for k, v in cfg.items():
        if isinstance(v, dict):
            expand_cfg_vars(v)
        elif isinstance(v, str):
            if "MachineConfig." in v:
                var = v.split(".")[1].split("/")[0]
                rest = v[len("MachineConfig.") + len(var):]
                v = getattr(MachineConfig, var) + rest
            cfg[k] = os.path.expandvars(v)


def merge_monodepth_options(cfg: Dict[str, Any]) -> Dict[str, Any]:
    """Merge the shared monodepth_options block into model/data sections
    (reference train.py:156-160)."""
    mono = cfg.get("monodepth_options", {})
    for section in ("model", "data"):
        cfg.setdefault(section, {})
        for k, v in mono.items():
            cfg[section].setdefault(k, v)
    return cfg


def load_config(path: str, machine: str = "ws") -> Dict[str, Any]:
    with open(path) as f:
        cfg = yaml.safe_load(f)
    cfg.setdefault("machine", machine)
    MachineConfig(cfg["machine"])
    expand_cfg_vars(cfg)
    return merge_monodepth_options(cfg)
