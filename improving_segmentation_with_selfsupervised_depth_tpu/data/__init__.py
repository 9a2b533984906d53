"""Host-side input pipeline: datasets, transforms, prefetching loaders.

Counterpart of the reference `loader/` package, re-designed as a numpy
pipeline feeding device-sharded batches (no torch DataLoader)."""

from .registry import build_loader, get_loader

__all__ = ["build_loader", "get_loader"]
