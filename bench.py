"""Benchmark harness: runs the headline catalog queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints one JSON line.

Each query is timed as a full action (plan → execute → count via
collect-less foreach) after a warm-up of the session. Timings include
Catalyst planning; parquet scans are cold per query.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_wrap_spark import catalog
from etl_wrap_spark.session import get_session

# headline set: kept to the queries that exercise distinct plan shapes;
# extend as operators land.
HEADLINE = [
    "q01_pricing_summary",
    "q02_lookup_enrichment",
    "q03_revenue_by_nation",
    "q04_topk_orders_per_customer",
    "q05_prev_row_delta",
    "q06_upsert_latest_event",
    "q07_delete_before_insert",
    "q10_rollup_priority",
    "q11_events_tumbling_hourly",
    "q12_events_sessionize",
    "q23_minhash_lsh_neardup",
    "q25_simhash",
    "q26_ann_bruteforce",
    "q29_asof_join",
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None
    spark = get_session("etl_wrap_spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = catalog.queries()
    names = [n for n in HEADLINE if n in qs] + [n for n in sorted(qs) if n not in HEADLINE]

    # JVM/codegen warm-up: a trivial plan plus one small parquet scan so
    # the vectorized reader + codegen paths are hot before timing starts
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").selectExpr(
        "sum(cast(l_quantity as decimal(18,4)))"
    ).collect()

    timings = {}
    for name in names:
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        # noop sink executes the FULL plan (incl. projections a count()
        # would prune) entirely JVM-side, without driver materialization.
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {timings[name]}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "catalog_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
