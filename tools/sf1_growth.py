"""Merge the synthetic-sf1 catalog bench into BENCH_DETAIL.json and
report per-query growth factors (round-4 VERDICT #4: "bench the full
catalog one decade up — any query >15x at 10x data gets a diagnosis or
a fix").

Reads BENCH_DETAIL.json (sf0.1 run) and BENCH_SF1_DETAIL.json
(SPARK_GRAFT_SF_DIR=/tmp/synth_sf1 run), writes the growth map into
BENCH_DETAIL.json under "sf1" and prints a sorted table.

Usage: python tools/sf1_growth.py [threshold]
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    threshold = float(sys.argv[1]) if len(sys.argv) > 1 else 15.0
    base = json.load(open(os.path.join(ROOT, "BENCH_DETAIL.json")))
    sf1 = json.load(open(os.path.join(ROOT, "BENCH_SF1_DETAIL.json")))
    b, s = base["queries"], sf1["queries"]
    growth = {
        n: round(s[n] / b[n], 2) if b[n] > 0 else None
        for n in s
        if n in b
    }
    base["sf1"] = {
        "source": "tools/make_synthetic_sf1.py (10 key-shifted copies of sf0.1)",
        "value": sf1["value"],
        "cold_total": sf1.get("cold_total"),
        "exec_only_total": sf1.get("exec_only_total"),
        "duckdb_total": sf1.get("duckdb_total"),
        "n_queries": sf1.get("n_queries"),
        "queries": s,
        "growth_vs_sf0.1": growth,
        "ratio_summary": sf1.get("ratio_summary"),
    }
    with open(os.path.join(ROOT, "BENCH_DETAIL.json"), "w") as fh:
        json.dump(base, fh, indent=1)

    ranked = sorted(growth.items(), key=lambda kv: -(kv[1] or 0))
    print(f"{'query':42s} {'sf0.1':>7s} {'sf1':>8s} {'growth':>7s}")
    for n, g in ranked:
        flag = "  <== >%.0fx" % threshold if g and g > threshold else ""
        print(f"{n:42s} {b[n]:7.2f} {s[n]:8.2f} {g:7.2f}{flag}")
    over = [n for n, g in ranked if g and g > threshold]
    gvals = sorted(g for g in growth.values() if g)
    print(f"\nmedian growth {gvals[len(gvals) // 2]:.2f}x at 10x data; "
          f"{len(over)} queries over {threshold:.0f}x: {over}")


if __name__ == "__main__":
    main()
