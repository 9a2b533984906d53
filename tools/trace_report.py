"""Summarize a jax.profiler trace: top device ops by total duration.

Usage: python tools/trace_report.py [trace_dir=/tmp/jaxtrace] [top_n=40]
Reads the newest plugins/profile/*/\*.trace.json.gz under trace_dir and
aggregates complete events ('ph' == 'X') on device tracks by op name.
"""

import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict


def newest_trace(trace_dir):
    files = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        raise SystemExit(f"no trace under {trace_dir}")
    return max(files, key=os.path.getmtime)


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxtrace"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    path = newest_trace(trace_dir)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]

    # device track pids: process names containing 'TPU' / 'Device'
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if re.search(r"TPU|Device|/device", n, re.I)}

    tot = defaultdict(float)
    cnt = defaultdict(int)
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        tot[name] += e.get("dur", 0.0)
        cnt[name] += 1

    grand = sum(tot.values())
    print(f"trace: {path}")
    print(f"device pids: {sorted(dev_pids)} ({[pid_names[p] for p in sorted(dev_pids)][:4]})")
    print(f"total device time: {grand/1e3:.1f} ms over {sum(cnt.values())} events")
    print(f"{'total_ms':>9} {'n':>5} {'mean_us':>9}  name")
    for name in sorted(tot, key=tot.get, reverse=True)[:top_n]:
        print(f"{tot[name]/1e3:9.2f} {cnt[name]:5d} {tot[name]/cnt[name]:9.1f}  {name[:110]}")


if __name__ == "__main__":
    main()
