"""Scaling probe: times representative catalog queries at sf0.001 /
sf0.01 / sf0.1 (100x data range) in ONE warmed session, isolating
data-volume scaling from JVM/codegen constants.

Usage: python tools/scaling_probe.py [query ...]  → markdown table.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_wrap_spark import catalog
from etl_wrap_spark.session import get_session

DEFAULT = [
    "q01_pricing_summary",
    "q03_revenue_by_nation",
    "q05_prev_row_delta",
    "q12_events_sessionize",
    "q23_minhash_lsh_neardup",
    "q26_ann_bruteforce",
    "q29_asof_join",
]

# override with SPARK_GRAFT_PROBE_DIRS=/dir1,/dir2 (absolute paths)
SFS = ["sf0.001", "sf0.01", "sf0.1"]


def main():
    names = sys.argv[1:] or DEFAULT
    dirs = os.environ.get("SPARK_GRAFT_PROBE_DIRS")
    sfs = dirs.split(",") if dirs else [f"/root/testdata/{sf}" for sf in SFS]
    spark = get_session("scaling-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = catalog.queries()
    # warm: run every probe query once at the smallest sf so codegen and
    # scan setup are excluded from the measurement
    for n in names:
        qs[n](spark, sfs[0]).write.format("noop").mode("overwrite").save()
    labels = [os.path.basename(p.rstrip("/")) for p in sfs]
    print("| query | " + " | ".join(labels) + " | last/prev ratio |")
    print("|" + "---|" * (len(labels) + 2))
    for n in names:
        times = []
        for sf in sfs:
            t0 = time.time()
            qs[n](spark, sf).write.format("noop").mode("overwrite").save()
            times.append(time.time() - t0)
        ratio = times[-1] / times[-2] if len(times) > 1 and times[-2] > 0 else float("nan")
        print(f"| {n} | " + " | ".join(f"{t:.2f}s" for t in times) + f" | {ratio:.1f}x |")


if __name__ == "__main__":
    main()
