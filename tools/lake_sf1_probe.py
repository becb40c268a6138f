"""Lake layer at sf1 (round-5 verdict #7): time MERGE / compaction /
CDF on the synthetic sf1 lineitem (~6M rows) with a partition-count
sweep, so the 100-TB story carries measurements, not just design
argument.

Writes a markdown table to stdout (splice into SCALING.md) and a JSON
blob to /tmp/lake_sf1_probe.json.

Usage: python tools/lake_sf1_probe.py [sf_dir] (default /tmp/synth_sf1)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

# unique row key in the synthetic lineitem (6M distinct of 6M rows —
# (l_orderkey, l_linenumber) alone is NOT unique in this data, and
# snapshot_diff/upsert key semantics assume uniqueness)
UKEY = ["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"]

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_wrap_spark.session import get_session, load_tables
from etl_wrap_spark.sinks.lake import AtomicTable, PartitionedAtomicTable, table_changes


def timed(fn):
    t0 = time.time()
    out = fn()
    return round(time.time() - t0, 2), out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/synth_sf1"
    spark = get_session("lake-sf1-probe")
    spark.sparkContext.setLogLevel("ERROR")
    t = load_tables(spark, sf_dir, ["lineitem", "orders"])
    li = t["lineitem"]
    n_rows = li.count()
    results = {"sf_dir": sf_dir, "lineitem_rows": n_rows, "atomic": {}, "partitioned": {}}
    print(f"# lake sf1 probe: lineitem = {n_rows:,} rows", file=sys.stderr)

    root = "/tmp/lake_sf1_probe"
    shutil.rmtree(root, ignore_errors=True)

    # ---------------- AtomicTable: write -> MERGE -> compact -> CDF
    at = AtomicTable(spark, f"{root}/atomic")
    s, _ = timed(lambda: at.write(li, stats_cols=["l_orderkey"]))
    results["atomic"]["initial_write_s"] = s
    # MERGE: touch ~1% of keys (update) + fresh keys (insert)
    upd = (
        li.where(F.col("l_orderkey") % 100 == 0)
        .withColumn("l_quantity", F.col("l_quantity") + 1)
    )
    ins = (
        li.where(F.col("l_orderkey") % 100 == 1)
        .withColumn("l_orderkey", F.col("l_orderkey") + 700_000_000)
    )
    delta = upd.unionByName(ins)
    n_delta = delta.count()
    s, _ = timed(lambda: at.upsert(delta, UKEY))
    results["atomic"]["merge_rows"] = n_delta
    results["atomic"]["merge_s"] = s
    s, _ = timed(lambda: at.compact(target_files=8))
    results["atomic"]["compact_s"] = s
    v = at.current_version()
    s, n = timed(
        lambda: table_changes(at, v - 2, v - 1, UKEY).count()
    )
    results["atomic"]["cdf_s"] = s
    results["atomic"]["cdf_rows"] = n

    # ------------- PartitionedAtomicTable: partition-count sweep
    # partition on a derived bucket so we control dir count exactly
    for n_parts in (8, 32, 128):
        pt_root = f"{root}/part_{n_parts}"
        pt = PartitionedAtomicTable(spark, pt_root, "pbucket")
        dfp = li.withColumn("pbucket", F.pmod(F.col("l_orderkey"), F.lit(n_parts)))
        s_w, _ = timed(lambda: pt.write(dfp, stats_cols=["l_orderkey"]))
        # partition-granular MERGE touching exactly ONE partition
        one = dfp.where(F.col("pbucket") == 3).withColumn(
            "l_quantity", F.col("l_quantity") + 1
        )
        n_one = one.count()
        s_m, _ = timed(lambda: pt.upsert(one, UKEY))
        # pruned read: single partition dir + zone-map chain, broad range
        s_r, n_r = timed(
            lambda: pt.read_pruned(
                "l_orderkey", 0, 10_000_000_000, values=["3"]
            ).count()
        )
        results["partitioned"][str(n_parts)] = {
            "write_s": s_w,
            "merge_one_partition_s": s_m,
            "merge_rows": n_one,
            "pruned_read_s": s_r,
            "pruned_rows": n_r,
        }
        print(f"# n_parts={n_parts}: write={s_w}s merge(1 dir)={s_m}s "
              f"pruned_read={s_r}s", file=sys.stderr)

    json.dump(results, open("/tmp/lake_sf1_probe.json", "w"), indent=1)

    a = results["atomic"]
    print("\n### Lake layer at sf1 (synthetic, ~6M-row lineitem)\n")
    print(f"AtomicTable (unpartitioned), {n_rows:,} rows:\n")
    print("| operation | wall | notes |")
    print("|---|---|---|")
    print(f"| initial write + zone maps | {a['initial_write_s']} s | full refresh, stats_cols=[l_orderkey] |")
    print(f"| MERGE ({a['merge_rows']:,} delta rows) | {a['merge_s']} s | full-table rewrite — the unpartitioned posture |")
    print(f"| compact(target_files=8) | {a['compact_s']} s | atomic version bump, zones rebuilt |")
    print(f"| CDF between versions | {a['cdf_s']} s | {a['cdf_rows']:,} change rows, derived after the fact |")
    print("\nPartitionedAtomicTable partition-count sweep (MERGE touches ONE dir):\n")
    print("| dirs | write | MERGE (1 dir) | pruned read |")
    print("|---|---|---|---|")
    for n_parts, r in results["partitioned"].items():
        print(f"| {n_parts} | {r['write_s']} s | {r['merge_one_partition_s']} s | {r['pruned_read_s']} s |")


if __name__ == "__main__":
    main()
