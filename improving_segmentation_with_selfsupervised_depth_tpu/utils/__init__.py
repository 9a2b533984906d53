"""Shared utilities: seeding, filesystem glob, logging."""

from .misc import np_local_seed, recursive_glob, get_logger, set_seeds

__all__ = ["np_local_seed", "recursive_glob", "get_logger", "set_seeds"]
