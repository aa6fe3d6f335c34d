#!/usr/bin/env python
"""Summarize an xprof trace (captured via INFODIFF_PROFILE or
tools/profile_sampler.py): self-time by HLO op category, top individual
ops, and bound-by attribution. Pure-host analysis of the .xplane.pb via
the xprof pip package — no TensorBoard UI needed.

Usage: python tools/trace_summary.py <trace_dir_or_xplane.pb> [top_n]
"""

import glob
import json
import os
import sys
from collections import defaultdict


def find_xplane(path: str) -> str:
    if path.endswith(".xplane.pb"):
        return path
    hits = sorted(
        glob.glob(os.path.join(path, "**", "*.xplane.pb"), recursive=True)
    )
    if not hits:
        raise FileNotFoundError(f"no .xplane.pb under {path}")
    return hits[-1]  # most recent capture


def load_hlo_stats(xplane: str):
    from xprof.convert import raw_to_tool_data as rttd

    data, _ = rttd.xspace_to_tool_data([xplane], "hlo_stats", {})
    obj = json.loads(data.decode() if isinstance(data, bytes) else data)
    cols = [c["label"] for c in obj["cols"]]
    rows = []
    for r in obj["rows"]:
        vals = [c.get("v") for c in r["c"]]
        rows.append(dict(zip(cols, vals)))
    return rows


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/trace_sampler"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    rows = load_hlo_stats(find_xplane(path))

    total = sum(r["Total self time (us)"] for r in rows)
    by_cat = defaultdict(float)
    by_bound = defaultdict(float)
    for r in rows:
        by_cat[r["HLO op category"]] += r["Total self time (us)"]
        by_bound[r["Bound by"]] += r["Total self time (us)"]

    print(f"total device self time: {total/1e3:.2f} ms\n")
    print("== self time by HLO category ==")
    for cat, us in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"{us/1e3:10.2f} ms  {100*us/total:5.1f}%  {cat}")
    print("\n== self time by bound-by ==")
    for b, us in sorted(by_bound.items(), key=lambda kv: -kv[1]):
        print(f"{us/1e3:10.2f} ms  {100*us/total:5.1f}%  {b}")
    print(f"\n== top {top_n} ops ==")
    rows.sort(key=lambda r: -r["Total self time (us)"])
    for r in rows[:top_n]:
        fw = (r["Framework op name"] or "").split("/")[-1][:70]
        print(
            f"{r['Total self time (us)']/1e3:9.2f} ms "
            f"{100*r['Total self time (us)']/total:5.1f}% "
            f"x{int(r['#Occurrences']):<4} {r['HLO op category']:<24} "
            f"{r['Bound by']:<8} bw={r['Measured memory BW (GiB/s)']:.0f} "
            f"{fw}"
        )


if __name__ == "__main__":
    main()
