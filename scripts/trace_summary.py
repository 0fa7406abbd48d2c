"""Summarize an xprof trace (from --profile-dir or jax.profiler.trace) into
per-op and per-HLO-category device-time tables.

Usage:
    python scripts/trace_summary.py <trace_dir_or_trace.json.gz> [top_n]

Finds the newest */plugins/profile/*/ *.trace.json.gz under the directory,
aggregates TPU-lane events, and prints:
  - total device time per HLO category (convolution / loop fusion / copy ...)
  - the top-N individual ops by total duration.
Divide by your step count for per-step numbers (the tool prints raw totals
plus per-occurrence averages).
"""

import collections
import glob
import gzip
import json
import os
import sys


def find_trace(path: str) -> str:
    if path.endswith(".trace.json.gz"):
        return path
    hits = sorted(
        glob.glob(os.path.join(path, "**", "*.trace.json.gz"), recursive=True)
    )
    if not hits:
        raise SystemExit(f"no *.trace.json.gz under {path}")
    return hits[-1]


def main():
    path = find_trace(sys.argv[1] if len(sys.argv) > 1 else ".")
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    with gzip.open(path) as f:
        tr = json.load(f)
    ev = tr.get("traceEvents", [])
    pids = {
        e["pid"]: e["args"]["name"]
        for e in ev
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    cat_dur = collections.Counter()
    cat_cnt = collections.Counter()
    op_dur = collections.Counter()
    op_cnt = collections.Counter()
    for e in ev:
        if e.get("ph") != "X" or "TPU" not in pids.get(e.get("pid", -1), ""):
            continue
        d = e.get("dur", 0)
        args = e.get("args", {})
        cat = args.get("hlo_category", args.get("category", "?"))
        cat_dur[cat] += d
        cat_cnt[cat] += 1
        name = e["name"].split("(")[0][:70]
        op_dur[name] += d
        op_cnt[name] += 1

    print(f"trace: {path}")
    print("\n== device time by HLO category ==")
    for cat, d in cat_dur.most_common():
        print(f"{d/1e3:10.2f} ms  x{cat_cnt[cat]:6d}  {cat}")
    print(f"\n== top {top_n} ops ==")
    for name, d in op_dur.most_common(top_n):
        print(f"{d/1e3:10.2f} ms  x{op_cnt[name]:6d}  {name}")


if __name__ == "__main__":
    main()
