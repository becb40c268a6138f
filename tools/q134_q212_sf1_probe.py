"""Round-10 verdict ask #4: q134 interpolate_linear and q212
hodges_lehmann at sf1 — fuse-or-prove-floor.

Decomposes each query's sf1 exec into its plan stages by timing
progressively larger prefixes of the SAME plan (each prefix executed
via toRdd().count() on a fresh DataFrame, min of 3):

q134: (a) events scan+filter+groupBy obs grain, (b) + bounds/grid
explode + union, (c) + the prev-value window pass, (d) full query
(+ next-value window + projection). If (c)->(d) adds ~nothing and
(a)+(b) dominate, the two window functions are NOT the wall and fusing
them (the ask's option A) cannot reach the bar — the committed numbers
ARE the floor proof (option B).

q212: (a) orders scan + cohort-month aggregation, (b) + Walsh pair join,
(c) full (+ per-cohort median read-out). The aggregation grain is
1.5M rows -> 4.2k cells; if (a) dominates, the query is scan-bound and
near-floor.

Writes Q134_Q212_SF1_PROBE.json. Run AFTER generating /tmp/synth_sf1
(tools/make_synthetic_sf1.py).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_wrap_spark.session import get_session, load_tables

SF1 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/synth_sf1"


def timed(build, runs=3):
    best = None
    for _ in range(runs):
        t0 = time.time()
        df = build()
        df._jdf.queryExecution().toRdd().count()
        el = time.time() - t0
        best = el if best is None else min(best, el)
    return round(best, 4)


def main():
    spark = get_session("q134-q212-probe")
    spark.sparkContext.setLogLevel("ERROR")
    out = {"sf_dir": SF1}

    t = load_tables(spark, SF1, ["events", "orders"])

    # ---- q134 stages
    def obs():
        return (
            t["events"]
            .where(F.col("user_id") % 100 == 7)
            .groupBy("user_id", "ts")
            .agg(F.max(F.col("value").cast("decimal(18,4)")).cast("double").alias("v"))
        )

    def unioned():
        o = obs().select(
            "user_id", F.col("ts").alias("__ts"),
            F.col("v").alias("__v"), F.lit(0).alias("__is_grid"))
        bounds = o.select("user_id").distinct().select(
            "user_id",
            F.lit("2024-01-01 00:00:00").cast("timestamp").alias("__lo"),
            F.lit("2024-01-30 18:00:00").cast("timestamp").alias("__hi"))
        grid = bounds.select(
            "user_id",
            F.explode(F.sequence("__lo", "__hi", F.expr("INTERVAL 6 hours"))).alias("__ts"),
        ).select("user_id", "__ts", F.lit(None).cast("double").alias("__v"),
                 F.lit(1).alias("__is_grid"))
        return o.unionByName(grid)

    def one_window():
        rows = unioned()
        w = Window.partitionBy("user_id").orderBy("__ts", "__is_grid")
        prev = w.rowsBetween(Window.unboundedPreceding, 0)
        return rows.withColumn("pv", F.last("__v", ignorenulls=True).over(prev))

    def full_q134():
        from etl_wrap_spark.catalog import queries

        return queries()["q134_interpolate_linear"](spark, SF1)

    out["q134"] = {
        "a_obs_grain": timed(obs),
        "b_union_grid": timed(unioned),
        "c_one_window": timed(one_window),
        "d_full": timed(full_q134),
    }

    # ---- q212 stages
    def cohort_agg():
        return (
            t["orders"]
            .groupBy(
                (F.col("o_custkey") % 50).alias("cohort"),
                (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
                .cast("bigint").alias("period"),
            )
            .agg(F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint"))
                 .cast("bigint").alias("rev_c"))
        )

    def pair_join():
        m = cohort_agg()
        a = m.select("cohort", F.col("period").alias("pa"), F.col("rev_c").alias("va"))
        b = m.select("cohort", F.col("period").alias("pb"), F.col("rev_c").alias("vb"))
        return a.join(b, "cohort").where(F.col("pa") <= F.col("pb")).select(
            "cohort", (F.col("va") + F.col("vb")).alias("walsh2"))

    def full_q212():
        from etl_wrap_spark.catalog import queries

        return queries()["q212_hodges_lehmann"](spark, SF1)

    out["q212"] = {
        "a_cohort_agg": timed(cohort_agg),
        "b_walsh_pairs": timed(pair_join),
        "c_full": timed(full_q212),
    }

    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "Q134_Q212_SF1_PROBE.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
