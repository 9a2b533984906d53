"""Image loading + subset restriction for the host input pipeline.

Counterpart of reference loader/loader_utils.py. PIL decode (which releases
the GIL) + numpy; an LRU cache mirrors the reference's cached pseudo-depth
loads (loader_utils.py:17-20)."""

from __future__ import annotations

from copy import deepcopy
from functools import lru_cache
from typing import Dict, List, Optional

import numpy as np
from PIL import Image

from ..utils import np_local_seed

_ANTIALIAS = getattr(Image, "LANCZOS", getattr(Image, "ANTIALIAS", 1))


def _build_size(img: Image.Image, width: int, height: int):
    return (img.width if width == -1 else width, img.height if height == -1 else height)


def _load(path: str, is_segmentation: bool, width: int, height: int) -> Image.Image:
    with open(path, "rb") as f:
        with Image.open(f) as img:
            if is_segmentation:
                img = img.convert()
                img = img.resize(_build_size(img, width, height), Image.NEAREST)
            else:
                img = img.convert("RGB")
                img = img.resize(_build_size(img, width, height), _ANTIALIAS)
    return img


@lru_cache(maxsize=5000)
def _load_cached(path, is_segmentation, width, height):
    return _load(path, is_segmentation, width, height)


def pil_loader(path: str, std_width: int, std_height: int, is_segmentation: bool = False,
               use_cache: bool = False) -> Image.Image:
    fn = _load_cached if use_cache else _load
    return fn(path, is_segmentation, std_width, std_height)


def restrict_to_subset(
    files: List[Dict],
    mode: str,
    n_subset: int,
    seed: int,
    load_labeled: bool,
    load_unlabeled: bool,
    subset: Optional[List[int]] = None,
) -> List[Dict]:
    """Split file list into labeled subset / unlabeled rest.

    Bit-compatible with reference loader/loader_utils.py:46-83: 'random' uses
    the same seeded `np.random.permutation`, 'fixed' takes explicit indices.
    """
    assert mode == "fixed" or subset is None
    if mode == "random":
        with np_local_seed(seed):
            p = np.random.permutation(len(files))
        p = p[:n_subset]
    elif mode == "fixed":
        assert subset is not None and len(subset) == n_subset
        p = subset
    else:
        raise NotImplementedError(mode)
    p = set(int(i) for i in p)

    labeled_files = [f for f in files if f["idx"] in p]
    assert len(labeled_files) == n_subset
    unlabeled_files = [deepcopy(f) for f in files if f["idx"] not in p]
    for f in unlabeled_files:
        f["labeled"] = False

    if load_labeled and load_unlabeled:
        return deepcopy(labeled_files) + unlabeled_files
    if load_labeled:
        return labeled_files
    if load_unlabeled:
        return unlabeled_files
    raise ValueError("Neither unlabeled nor labeled data specified to be loaded.")
