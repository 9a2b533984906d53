"""Stored label-selection results.

The reference hard-codes the selected image indices per
dataset/method/seed in loader/preselected_labels.py (huge literal tables of
*results* produced by exp 211). Here the tables live as JSON next to this
module (or under SDT_PRESELECTED_DIR), written by the label-selection driver
itself (`label_selection.py` dumps `nlabels{N}_subset.json` per round —
reference label_selection.py:136-137); `import_reference_tables()` can ingest
the reference's tables for exact reproduction.

API (reference loader/preselected_labels.py:1-48):
  preselected_labels(seed, n, dataset, method) -> first n stored indices
  with seed in {42, 43, 44} and method in {"ent", "ds", "us", "ds_us"}.
"""

from __future__ import annotations

import json
import os
from typing import List

_DEFAULT_DIR = os.path.join(os.path.dirname(__file__), "preselected_tables")


def _table_path(dataset: str) -> str:
    base = os.environ.get("SDT_PRESELECTED_DIR", _DEFAULT_DIR)
    return os.path.join(base, f"{dataset}.json")


def store_selection(dataset: str, method: str, seed: int, indices: List[int]) -> str:
    path = _table_path(dataset)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    table = {}
    if os.path.exists(path):
        with open(path) as f:
            table = json.load(f)
    table.setdefault(method, {})[str(seed)] = [int(i) for i in indices]
    with open(path, "w") as f:
        json.dump(table, f)
    return path


def preselected_labels(seed: int, n: int, dataset: str = "cityscapes",
                       method: str = "ds_us") -> List[int]:
    path = _table_path(dataset)
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"No preselected-label table for {dataset} at {path}. Run the "
            f"label-selection experiment (id 211) to generate one, or import "
            f"the reference's tables with import_reference_tables().")
    with open(path) as f:
        table = json.load(f)
    sel = table[method][str(seed)]
    if len(sel) < n:
        raise ValueError(f"Stored selection has {len(sel)} < {n} indices")
    return sel[:n]


def import_reference_tables(reference_root: str) -> None:
    """Ingest the reference's hard-coded tables (read-only import, no code is
    copied — the tables are experiment outputs)."""
    import importlib.util
    import sys

    path = os.path.join(reference_root, "loader", "preselected_labels.py")
    spec = importlib.util.spec_from_file_location("_ref_preselected", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["_ref_preselected"] = mod
    spec.loader.exec_module(mod)
    # the reference module stores dict[dataset][method][seed] inside its
    # preselected_labels function's closure table; call it per combination
    for dataset in ("cityscapes", "camvid"):
        for method in ("ent", "ds", "us", "ds_us"):
            for seed in (42, 43, 44):
                try:
                    sel = mod.preselected_labels(seed, 10**9, dataset, method)
                except Exception:
                    try:
                        # fall back: ask for a small n
                        sel = mod.preselected_labels(seed, 1, dataset, method)
                    except Exception:
                        continue
                store_selection(dataset, method, seed, sel)
