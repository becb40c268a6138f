"""Plan diagnostics for every catalog query: shuffle (Exchange) count,
broadcast joins, sort-merge joins, whether filters/pruning reached the
parquet scans, and whole-stage-codegen coverage.

Usage: python tools/plan_report.py [sf_dir]  → markdown table on stdout.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_wrap_spark import catalog
from etl_wrap_spark.session import get_session


def analyze(plan: str) -> dict:
    return {
        "shuffles": len(re.findall(r"Exchange (?:hash|range|SinglePartition)", plan)),
        "bhj": plan.count("BroadcastHashJoin"),
        "smj": plan.count("SortMergeJoin"),
        "scans": plan.count("FileScan parquet"),
        "pushed": len(re.findall(r"DataFilters: \[[^\]]+\]", plan)),
    }


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_session("plan-report")
    spark.sparkContext.setLogLevel("ERROR")
    qs = catalog.queries()
    # note: WholeStageCodegen wrapping is applied at execution under AQE,
    # so it does not appear in the pre-execution plan string inspected here
    print("| query | shuffles | broadcast joins | sort-merge joins | parquet scans | scans w/ pushed filters |")
    print("|---|---|---|---|---|---|")
    for name in sorted(qs):
        try:
            df = qs[name](spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
            a = analyze(plan)
            print(
                f"| {name} | {a['shuffles']} | {a['bhj']} | {a['smj']} | "
                f"{a['scans']} | {a['pushed']} |"
            )
        except Exception as e:  # noqa: BLE001
            print(f"| {name} | error: {str(e)[:60]} | | | | |")


if __name__ == "__main__":
    main()
