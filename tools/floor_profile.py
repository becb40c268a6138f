"""Decompose the small-query wall floor (round-7 VERDICT ask #2).

For a handful of floor-bound catalog queries (exec-only 0.01-0.03 s
against millisecond DuckDB anchors, warm wall 0.15-0.45 s) this breaks
the per-query wall into its harness components:

- ``build``      — Python fn + py4j plan construction + Catalyst
                   ANALYSIS (schema resolution happens eagerly as the
                   DataFrame API composes);
- ``opt+plan``   — Catalyst optimization + physical planning, read
                   from Spark's own QueryPlanningTracker on the
                   executed frame;
- ``first_exec`` — everything from toRdd().count() on a fresh plan:
                   codegen compile + job scheduling + task run;
- ``fresh_exec`` — a SECOND DataFrame object of the same query,
                   executed after the first: janino's codegen cache
                   hits, so this is schedule + task run (+ shuffle
                   write) without compile;
- ``reexec``     — re-executing the SAME object: shuffle outputs
                   reused, so this is the final-stage schedule + fetch
                   floor;
- ``jobs``       — AQE job count for one execution (dagScheduler
                   nextJobId delta);
- ``sched_floor``— the empty-RDD job baseline on this container
                   (pure scheduling round-trip, no data, 1 task).

Usage: python tools/floor_profile.py [sf_dir] [queries...]
Writes FLOOR_PROFILE.json and prints a table.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_wrap_spark import catalog  # noqa: E402
from etl_wrap_spark.session import get_session  # noqa: E402

DEFAULT = ["q132", "q117", "q63", "q98", "q89"]


def phases_ms(df) -> dict[str, int]:
    out = {}
    it = df._jdf.queryExecution().tracker().phases().iterator()
    while it.hasNext():
        e = it.next()
        out[e._1()] = e._2().durationMs()
    return out


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or DEFAULT
    spark = get_session()
    sc = spark.sparkContext
    qs = catalog.queries()

    def execute(df):
        return df._jdf.queryExecution().toRdd().count()

    def next_job_id():
        return sc._jsc.sc().dagScheduler().nextJobId()

    # container scheduling floor: an empty 1-task job, best of 5 warm
    for _ in range(3):
        sc.parallelize([], 1).count()
    sched = []
    for _ in range(5):
        t0 = time.time()
        sc.parallelize([], 1).count()
        sched.append(time.time() - t0)
    sched_floor = round(min(sched), 4)

    rows = {}
    for want in names:
        full = next(k for k in qs if k.startswith(want + "_") or k == want)
        fn = qs[full]
        # warm: codegen caches, parquet footers, JIT
        for _ in range(2):
            execute(fn(spark, sf))

        best = None
        for _ in range(3):
            t0 = time.time()
            df = fn(spark, sf)
            t_build = time.time() - t0

            j0 = next_job_id()
            t0 = time.time()
            execute(df)
            t_first = time.time() - t0
            jobs = next_job_id() - j0

            ph = phases_ms(df)

            t0 = time.time()
            execute(df)
            t_re = time.time() - t0

            df2 = fn(spark, sf)
            t0 = time.time()
            execute(df2)
            t_fresh = time.time() - t0

            rec = {
                "build": round(t_build, 4),
                "analysis_ms": ph.get("analysis", 0),
                "opt_plan_ms": ph.get("optimization", 0) + ph.get("planning", 0),
                "first_exec": round(t_first, 4),
                "fresh_exec": round(t_fresh, 4),
                "reexec": round(t_re, 4),
                "jobs": jobs,
                "wall": round(t_build + t_first, 4),
            }
            if best is None or rec["wall"] < best["wall"]:
                best = rec
        rows[full] = best
        print(full, json.dumps(best))

    out = {
        "sched_floor_empty_job": sched_floor,
        "sf_dir": sf,
        "queries": rows,
        "note": (
            "wall = build + first_exec; fresh_exec isolates schedule+run "
            "(codegen cached); reexec isolates final-stage schedule+fetch "
            "(shuffle reused); opt/plan ms from QueryPlanningTracker"
        ),
    }
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "FLOOR_PROFILE.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"sched_floor(empty 1-task job) = {sched_floor}s")


if __name__ == "__main__":
    main()
