"""Join a jax.profiler device trace with optimized-HLO metadata: time per
model component.

The trace gives per-op wall time but opaque names (fusion.6914); the
compiled HLO's `metadata={op_name="jit(train_step)/..."}` says which module
each op computes for. This tool joins the two and aggregates device time by
(component, hlo_category-ish bucket), answering "where do the conv
milliseconds actually live" at module granularity.

Usage:
  python tools/trace_attrib.py [trace_dir=/tmp/jaxtrace] [hlo=/tmp/step_hlo.txt] [n_steps=3]

The HLO text must come from the SAME program the trace captured
(jax.jit(...).lower(...).compile().as_text() with identical config), or
fusion numbering will not line up.
"""

import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict

_COMPONENT_TAGS = [
    ("pose_encoder", "pose_encoder"),
    ("predict_poses", "pose"),
    ("/pose/", "pose"),
    ("/encoder/", "encoder(SDE)"),
    ("unet_dec", "seg unet_dec"),
    ("segmentation/classifier", "seg classifier"),
    ("segmentation/", "seg head"),
    ("/depth/", "depth decoder"),
    ("bilinear_warp", "warp kernel"),
    ("generate_images_pred", "photometric fwd"),
    ("compute_losses", "photometric loss"),
    ("ssim", "photometric loss"),
    ("sgd", "optimizer"),
    ("clip", "optimizer"),
]


_STAGE_PAT = re.compile(r"(upconv_\d|dispconv_\d|skip_proj_\d|aspp)", re.I)


def component_of(op_name: str) -> str:
    for tag, comp in _COMPONENT_TAGS:
        if tag in op_name:
            # split the two U-Net decoders by stage (upconv_i names carry
            # through Flax module paths into HLO op_name metadata), so a
            # trace directly shows WHICH stage's convs are off-roofline
            if comp in ("depth decoder", "seg unet_dec"):
                m = _STAGE_PAT.search(op_name)
                if m:
                    return f"{comp}:{m.group(1)}"
            return comp
    parts = op_name.split("/")
    return parts[1] if len(parts) > 1 else op_name[:30]


def load_hlo_map(path: str):
    """op result name (sans %) -> (op_name metadata, direction)."""
    pat = re.compile(r"%(\S+) = .*?op_name=\"([^\"]*)\"")
    out = {}
    with open(path) as f:
        for line in f:
            m = pat.search(line)
            if not m:
                continue
            name, op = m.groups()
            direction = "bwd" if "transpose(" in op else "fwd"
            out[name] = (op, direction)
    return out


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxtrace"
    hlo_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/step_hlo.txt"
    n_steps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    files = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True)
    path = max(files, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", "")
    dev = [p for p, n in names.items() if "TPU" in n]
    hlo = load_hlo_map(hlo_path)

    agg = defaultdict(float)
    unattributed = defaultdict(float)
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev:
            continue
        n = e["name"]
        if n.startswith("jit_train_step") or n in ("0", "1", "2", "3", "4"):
            continue
        ms = e["dur"] / 1000.0 / n_steps
        cat = (e.get("args") or {}).get("hlo_category", "?")
        meta = hlo.get(n) or hlo.get(n + ".clone.1") or hlo.get(n + ".clone")
        if meta is None and "bilinear_warp" in n:
            meta = ("bilinear_warp", "fwd")
        if meta is None:
            unattributed[(n.split(".")[0], cat)] += ms
            continue
        op, direction = meta
        agg[(component_of(op), cat, direction)] += ms

    rows = sorted(agg.items(), key=lambda kv: -kv[1])
    total = sum(agg.values()) + sum(unattributed.values())
    print(f"attributed {sum(agg.values()):.1f} / total {total:.1f} ms/step")
    print(f"{'ms':>7}  component / category / dir")
    for (comp, cat, d), ms in rows:
        if ms < 0.4:
            continue
        print(f"{ms:7.1f}  {comp:20s} {cat:25s} {d}")
    top_un = sorted(unattributed.items(), key=lambda kv: -kv[1])[:10]
    print("-- unattributed --")
    for (n, cat), ms in top_un:
        if ms < 0.4:
            continue
        print(f"{ms:7.1f}  {n:20s} {cat}")


if __name__ == "__main__":
    main()
