"""Config grid expansion.

The reference tags experiment variants with ray.tune `grid_search` markers and
resolves them through a subclassed BasicVariantGenerator
(utils/cluster_utils.py:9-102). It only ever uses the marker as a tagging /
cross-product device, so the TPU build replaces the ray dependency with a
plain deterministic product expansion over `grid_search([...])` markers.
"""

from __future__ import annotations

import itertools
from copy import deepcopy
from typing import Any, Dict, List, Tuple


def grid_search(values: List[Any]) -> Dict[str, Any]:
    """Marker compatible with ray.tune.grid_search."""
    return {"grid_search": list(values)}


def _find_grid_points(cfg: Any, path: Tuple = ()) -> List[Tuple[Tuple, List[Any]]]:
    points = []
    if isinstance(cfg, dict):
        if set(cfg.keys()) == {"grid_search"}:
            return [(path, cfg["grid_search"])]
        for k, v in cfg.items():
            points.extend(_find_grid_points(v, path + (k,)))
    return points


def _set_path(cfg: Dict, path: Tuple, value: Any) -> None:
    node = cfg
    for k in path[:-1]:
        node = node[k]
    node[path[-1]] = value


def expand_grid(cfg: Dict[str, Any]) -> List[Dict[str, Any]]:
    """Expand all grid_search markers into the cross-product of configs.

    Each resolved config gets a `general.tag` describing its variant (the
    reference encodes the tag itself as a 1-element grid)."""
    points = _find_grid_points(cfg)
    if not points:
        return [deepcopy(cfg)]
    paths, value_lists = zip(*points)
    out = []
    for combo in itertools.product(*value_lists):
        variant = deepcopy(cfg)
        for path, value in zip(paths, combo):
            _set_path(variant, path, value)
        out.append(variant)
    return out
