"""Config system: YAML configs + machine path indirection + var expansion."""

from .machine import MachineConfig
from .loader import load_config, expand_cfg_vars, merge_monodepth_options

__all__ = ["MachineConfig", "load_config", "expand_cfg_vars", "merge_monodepth_options"]
