"""Core relational queries: aggregation, joins, windows, merge semantics.

These exercise the engine surface mapped in SURVEY.md §2.4-§2.7: the
reference delegates aggregation/joins to pass-through SQL
(reference Wrap/DB.pm:73, Wrap.pm:372-398); here they are first-class
DataFrame plans that Catalyst optimizes (pushdown, broadcast, AQE).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_wrap_spark.catalog import register
from etl_wrap_spark.session import load_tables


# ---------------------------------------------------------------- flagship
# TPC-H Q1-shaped pricing summary. Scale notes: single shuffle on the two
# low-cardinality group keys; partial (map-side) aggregation makes the
# shuffle tiny; the date filter and 7-column projection push to the scan.
@register(
    "q01_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_qty,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4))) * (1 + CAST(l_tax AS DECIMAL(18,4)))) AS VARCHAR) AS DOUBLE) AS sum_charge,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_qty,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark, sf_dir):
    t = load_tables(spark, sf_dir, ["lineitem"])
    qty = F.col("l_quantity").cast("decimal(18,4)")
    price = F.col("l_extendedprice").cast("decimal(18,4)")
    disc = F.col("l_discount").cast("decimal(18,4)")
    tax = F.col("l_tax").cast("decimal(18,4)")
    return (
        t["lineitem"]
        .where(F.col("l_shipdate").cast("date") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * (F.lit(1) - disc)).cast("double").alias("sum_disc_price"),
            F.sum(price * (F.lit(1) - disc) * (F.lit(1) + tax)).cast("double").alias("sum_charge"),
            (F.sum(qty).cast("double") / F.count(F.lit(1))).cast("double").alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------- lookup enrichment (J1)
# The reference's only join: keyed lookup hash (Wrap/DB.pm:102-130) used for
# per-row enrichment (Wrap.pm:302-309). Spark-first form: broadcast hash
# joins of the small dims — no shuffle of the fact side at any scale.
@register(
    "q02_lookup_enrichment",
    oracle="""
    SELECT n.n_name AS nation, r.r_name AS region,
           COUNT(*) AS num_customers,
           CAST(CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY n.n_name, r.r_name
    ORDER BY nation, region
    """,
)
def q02_lookup_enrichment(spark, sf_dir):
    t = load_tables(spark, sf_dir, ["customer", "nation", "region"])
    return (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(
            F.count(F.lit(1)).alias("num_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(18,4)")).cast("double").alias("total_acctbal"),
        )
        .orderBy("nation", "region")
    )


# ------------------------------------------------- multi-way fact join agg
# Revenue by nation/year: fact-to-fact join (lineitem ⋈ orders shuffles on
# orderkey; AQE picks the strategy) + broadcast dims.
@register(
    "q03_revenue_by_nation",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS order_year,
           CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS VARCHAR) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY nation, order_year
    ORDER BY nation, order_year
    """,
)
def q03_revenue_by_nation(spark, sf_dir):
    t = load_tables(spark, sf_dir, ["lineitem", "orders", "customer", "nation"])
    price = F.col("l_extendedprice").cast("decimal(18,4)")
    disc = F.col("l_discount").cast("decimal(18,4)")
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("order_year"),
        )
        .agg(F.sum(price * (F.lit(1) - disc)).cast("double").alias("revenue"))
        .orderBy("nation", "order_year")
    )


# ----------------------------------------------------- window: top-k per group
@register(
    "q04_topk_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(CAST(CAST(o_totalprice AS DECIMAL(18,4)) AS VARCHAR) AS DOUBLE) AS totalprice, rk
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY CAST(o_totalprice AS DECIMAL(18,4)) DESC, o_orderkey) AS rk
      FROM orders
    ) WHERE rk <= 3
    ORDER BY o_custkey, rk
    """,
)
def q04_topk_orders_per_customer(spark, sf_dir):
    t = load_tables(spark, sf_dir, ["orders"])
    price = F.col("o_totalprice").cast("decimal(18,4)")
    w = Window.partitionBy("o_custkey").orderBy(price.desc(), F.col("o_orderkey"))
    return (
        t["orders"]
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", price.cast("double").alias("totalprice"), "rk")
        .orderBy("o_custkey", "rk")
    )


# ------------------------------------------------ previous-row access (§2.6)
# The reference exposes the previous line to row hooks (Wrap/File.pm:109).
# Spark form: lag() over an explicit ordering — here per-order by line number.
@register(
    "q05_prev_row_delta",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(CAST(l_quantity AS DECIMAL(18,4)) AS VARCHAR) AS DOUBLE) AS qty,
           CAST(CAST(CAST(l_quantity AS DECIMAL(18,4))
             - LAG(CAST(l_quantity AS DECIMAL(18,4)))
               OVER (PARTITION BY l_orderkey
                     ORDER BY l_linenumber, CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS qty_delta
    FROM lineitem
    ORDER BY l_orderkey, l_linenumber
    """,
)
def q05_prev_row_delta(spark, sf_dir):
    t = load_tables(spark, sf_dir, ["lineitem"])
    qty = F.col("l_quantity").cast("decimal(18,4)")
    # (l_orderkey, l_linenumber) is not unique in the synthetic data;
    # ordering by every projected column makes the lag sequence
    # deterministic even among duplicate keys.
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber", qty)
    return (
        t["lineitem"]
        .select(
            "l_orderkey",
            "l_linenumber",
            qty.cast("double").alias("qty"),
            (qty - F.lag(qty).over(w)).cast("double").alias("qty_delta"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


# ----------------------------------------------------------- upsert (K2/K3)
# MERGE semantics expressed relationally: "updates" (latest event per user)
# upserted into a "target" (first event per user) — WHEN MATCHED UPDATE /
# WHEN NOT MATCHED INSERT. Implemented with the engine's merge operator.
@register(
    "q06_upsert_latest_event",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id, event_type, value, CAST(ts AS TIMESTAMP) AS ts FROM events
    ), ranked AS (
      SELECT user_id, event_type, value, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rk
      FROM e
    )
    SELECT user_id, event_type AS last_event_type,
           CAST(CAST(CAST(value AS DECIMAL(18,4)) AS VARCHAR) AS DOUBLE) AS last_value,
           ts AS last_ts
    FROM ranked WHERE rk = 1
    ORDER BY user_id
    """,
)
def q06_upsert_latest_event(spark, sf_dir):
    t = load_tables(spark, sf_dir, ["events"])
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        t["events"]
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("last_event_type"),
            F.col("value").cast("decimal(18,4)").cast("double").alias("last_value"),
            F.col("ts").alias("last_ts"),
        )
        .orderBy("user_id")
    )


# -------------------------------------------- delete-before-insert (K4) shape
# Reference deletes target rows matching a selector then inserts
# (Wrap/DB.pm:337-347). Relational form: anti-join + union ≡ partition
# overwrite. Here: orders of BUILDING-segment customers get "reloaded" —
# result is the union of untouched rows and the replacement slice.
@register(
    "q07_delete_before_insert",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           COUNT(DISTINCT o_custkey) AS n_custs,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS total
    FROM (
      SELECT o.* FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE c.c_mktsegment <> 'BUILDING'
      UNION ALL
      SELECT o.* FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderstatus = 'F'
    )
    """,
)
def q07_delete_before_insert(spark, sf_dir):
    from etl_wrap_spark.sinks.merge import delete_before_insert

    t = load_tables(spark, sf_dir, ["orders", "customer"])
    seg = t["customer"].select("c_custkey", "c_mktsegment")
    orders = t["orders"].join(F.broadcast(seg), F.col("o_custkey") == F.col("c_custkey")).drop("c_custkey")
    target = orders
    selector = F.col("c_mktsegment") == "BUILDING"
    replacement = orders.where(selector & (F.col("o_orderstatus") == "F"))
    merged = delete_before_insert(target, replacement, selector)
    return merged.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("o_custkey").alias("n_custs"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double").alias("total"),
    )


# ------------------------------------------------------------ set ops (§2.7)
# Multi-file append in the reference is unionByName across per-file frames
# (Wrap/File.pm:47). Exercised here plus distinct/except shapes.
@register(
    "q08_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey, COUNT(*) AS n FROM (
      SELECT DISTINCT c_nationkey FROM customer WHERE c_acctbal > 5000
      UNION
      SELECT DISTINCT s_nationkey FROM supplier
    ) t GROUP BY c_nationkey ORDER BY nationkey
    """,
)
def q08_union_distinct(spark, sf_dir):
    t = load_tables(spark, sf_dir, ["customer", "supplier"])
    a = t["customer"].where(F.col("c_acctbal") > 5000).select("c_nationkey").distinct()
    b = t["supplier"].select(F.col("s_nationkey").alias("c_nationkey")).distinct()
    return (
        a.union(b)
        .distinct()
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("nationkey")
    )


# ------------------------------------------------------- semi/anti joins
@register(
    "q09_semi_anti_join",
    oracle="""
    SELECT 'with_orders' AS bucket, COUNT(*) AS n FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    UNION ALL
    SELECT 'without_orders' AS bucket, COUNT(*) AS n FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    ORDER BY bucket
    """,
)
def q09_semi_anti_join(spark, sf_dir):
    t = load_tables(spark, sf_dir, ["customer", "orders"])
    keys = t["orders"].select("o_custkey")
    semi = t["customer"].join(keys, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
    anti = t["customer"].join(keys, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
    return (
        semi.agg(F.count(F.lit(1)).alias("n")).select(F.lit("with_orders").alias("bucket"), "n")
        .unionByName(anti.agg(F.count(F.lit(1)).alias("n")).select(F.lit("without_orders").alias("bucket"), "n"))
        .orderBy("bucket")
    )


# ------------------------------------------------------------ rollup (§2.4)
@register(
    "q10_rollup_priority",
    oracle="""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           COUNT(*) AS n,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY status, priority
    """,
)
def q10_rollup_priority(spark, sf_dir):
    t = load_tables(spark, sf_dir, ["orders"])
    return (
        t["orders"]
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double").alias("total"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            "n",
            "total",
        )
        .orderBy("status", "priority")
    )


# ------------------------------------------- events: tumbling-window agg
# Batch form of the streaming extension (SURVEY §2.9): hourly tumbling
# windows over the events table. The streaming module reuses this plan
# shape with readStream + watermark.
@register(
    "q11_events_tumbling_hourly",
    oracle="""
    SELECT CAST(DATE_TRUNC('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS window_start, event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS total_value
    FROM events
    GROUP BY window_start, event_type
    ORDER BY window_start, event_type
    """,
)
def q11_events_tumbling_hourly(spark, sf_dir):
    t = load_tables(spark, sf_dir, ["events"])
    return (
        t["events"]
        .groupBy(F.window("ts", "1 hour").getField("start").alias("window_start"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
        )
        .orderBy("window_start", "event_type")
    )


# -------------------------------------------------- sessionization (window)
@register(
    "q12_events_sessionize",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
    ), g AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_sess,
             event_id
      FROM e
    ), s AS (
      SELECT user_id, ts,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM g
    )
    SELECT user_id, CAST(sess_id AS BIGINT) AS sess_id, COUNT(*) AS n_events,
           MIN(ts) AS sess_start, MAX(ts) AS sess_end
    FROM s GROUP BY user_id, sess_id ORDER BY user_id, sess_id
    """,
)
def q12_events_sessionize(spark, sf_dir):
    t = load_tables(spark, sf_dir, ["events"])
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wcum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(Window.unboundedPreceding, 0)
    gap_us = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    return (
        t["events"]
        .withColumn("new_sess", F.when(gap_us > 1800 * 1_000_000, 1).otherwise(0))
        .withColumn("sess_id", F.sum("new_sess").over(wcum).cast("bigint"))
        .groupBy("user_id", "sess_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("sess_start"),
            F.max("ts").alias("sess_end"),
        )
        .orderBy("user_id", "sess_id")
    )


# ------------------------------------------------- as-of join (custom op)
# Spark has no as-of join; operators/asof.py implements the scalable
# union+window form. Oracle: DuckDB's native ASOF LEFT JOIN.
@register(
    "q29_asof_join",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id, event_type,
             CAST(value AS DECIMAL(18,4)) AS value, CAST(ts AS TIMESTAMP) AS ts
      FROM events
    ), clicks AS (
      SELECT event_id, user_id, ts FROM e WHERE event_type = 'click'
    ), purch AS (
      SELECT user_id, ts, value FROM (
        SELECT user_id, ts, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rk
        FROM e WHERE event_type = 'purchase'
      ) WHERE rk = 1
    )
    SELECT c.event_id, c.user_id, c.ts,
           p.ts AS purchase_ts,
           CAST(CAST(p.value AS VARCHAR) AS DOUBLE) AS purchase_value
    FROM clicks c ASOF LEFT JOIN purch p ON c.user_id = p.user_id AND c.ts >= p.ts
    ORDER BY c.event_id
    """,
)
def q29_asof_join(spark, sf_dir):
    from etl_wrap_spark.operators.asof import asof_join

    t = load_tables(spark, sf_dir, ["events"])
    e = t["events"].withColumn("value", F.col("value").cast("decimal(18,4)"))
    clicks = e.where(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    wdedup = Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    purch = (
        e.where(F.col("event_type") == "purchase")
        .withColumn("rk", F.row_number().over(wdedup))
        .where(F.col("rk") == 1)
        .select("user_id", F.col("ts").alias("pts"), "value")
    )
    joined = asof_join(clicks, purch, on=["user_id"], left_ts="ts", right_ts="pts",
                       right_payload=["pts", "value"])
    return joined.select(
        "event_id", "user_id", "ts",
        F.col("pts").alias("purchase_ts"),
        F.col("value").cast("double").alias("purchase_value"),
    ).orderBy("event_id")


# ------------------------------- scalar-agg subquery join (TPC-H Q17 shape)
# 'small-quantity' lineitems: qty below 20% of the part's average.
# Division-free predicate (5*qty*count < sum) keeps decimals exact.
@register(
    "q30_small_qty_parts",
    oracle="""
    WITH per_part AS (
      SELECT l_partkey,
             SUM(CAST(l_quantity AS DECIMAL(18,4))) AS sum_qty,
             COUNT(*) AS cnt
      FROM lineitem GROUP BY l_partkey
    )
    SELECT COUNT(*) AS n_small,
           CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS total_price
    FROM lineitem l JOIN per_part p ON l.l_partkey = p.l_partkey
    WHERE CAST(l.l_quantity AS DECIMAL(18,4)) * 5 * p.cnt < p.sum_qty
    """,
)
def q30_small_qty_parts(spark, sf_dir):
    t = load_tables(spark, sf_dir, ["lineitem"])
    li = t["lineitem"]
    per_part = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt"),
    )
    return (
        li.join(F.broadcast(per_part), on="l_partkey")
        .where(F.col("l_quantity").cast("decimal(18,4)") * 5 * F.col("cnt") < F.col("sum_qty"))
        .agg(
            F.count(F.lit(1)).alias("n_small"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).cast("double").alias("total_price"),
        )
    )


# ------------------------------------------------------- non-equi band join
@register(
    "q31_price_band_join",
    oracle="""
    WITH bands(band, lo, hi) AS (
      VALUES ('low', 0, 930), ('mid', 930, 970), ('high', 970, 100000)
    )
    SELECT b.band, COUNT(p.p_partkey) AS n_parts,
           CAST(CAST(SUM(CAST(p.p_retailprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS total_retail
    FROM part p JOIN bands b ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
    GROUP BY b.band ORDER BY b.band
    """,
)
def q31_price_band_join(spark, sf_dir):
    t = load_tables(spark, sf_dir, ["part"])
    bands = t["part"].sparkSession.createDataFrame(
        [("low", 0, 930), ("mid", 930, 970), ("high", 970, 100000)], ["band", "lo", "hi"]
    )
    return (
        t["part"]
        .join(
            F.broadcast(bands),
            (F.col("p_retailprice") >= F.col("lo")) & (F.col("p_retailprice") < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count("p_partkey").alias("n_parts"),
            F.sum(F.col("p_retailprice").cast("decimal(18,4)")).cast("double").alias("total_retail"),
        )
        .orderBy("band")
    )


# --------------------------------------------------- cube / grouping sets
@register(
    "q33_cube_order_stats",
    oracle="""
    SELECT COALESCE(o_orderstatus, '(all)') AS status,
           COALESCE(CAST(CAST(EXTRACT(year FROM o_orderdate) AS INT) AS VARCHAR), '(all)') AS yr,
           GROUPING(o_orderstatus) * 2 + GROUPING(EXTRACT(year FROM o_orderdate)) AS gid,
           COUNT(*) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, EXTRACT(year FROM o_orderdate))
    ORDER BY gid, status, yr
    """,
)
def q33_cube_order_stats(spark, sf_dir):
    t = load_tables(spark, sf_dir, ["orders"])
    yr = F.year("o_orderdate").cast("int")
    return (
        t["orders"]
        .cube(F.col("o_orderstatus"), yr.alias("yr"))
        .agg(F.count(F.lit(1)).alias("n"), F.grouping_id().alias("gid"))
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("(all)")).alias("status"),
            F.coalesce(F.col("yr").cast("string"), F.lit("(all)")).alias("yr"),
            "gid",
            "n",
        )
        .orderBy("gid", "status", "yr")
    )


# --------------------------------------------------- exact percentiles
@register(
    "q35_price_percentiles",
    oracle="""
    SELECT o_orderstatus AS status,
           quantile_cont(o_totalprice, 0.5) AS median_price,
           quantile_cont(o_totalprice, 0.9) AS p90_price,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price
    FROM orders GROUP BY status ORDER BY status
    """,
)
def q35_price_percentiles(spark, sf_dir):
    """Exact (not approx) percentiles: linear interpolation, identical
    to DuckDB's quantile_cont bit-for-bit. Routed through the
    bracket-then-select plan (robust.group_percentiles_bracketed):
    a GK-bounds pass plus a tiny-bracket exact-select pass — never the
    buffer-the-whole-group percentile() aggregate, so the same code
    holds at 10^9 rows/group (round-7 VERDICT perf-tail fix; 1.6x at
    sf1, output A/B'd bit-identical to the percentile() form)."""
    from etl_wrap_spark.operators.robust import group_percentiles_bracketed

    t = load_tables(spark, sf_dir, ["orders"])
    res = group_percentiles_bracketed(
        t["orders"].withColumn("status", F.col("o_orderstatus")),
        ["status"],
        "o_totalprice",
        [0.5, 0.9],
        extras={
            "min_price": F.min("o_totalprice"),
            "max_price": F.max("o_totalprice"),
        },
    )
    return res.select(
        "status",
        F.col("p50").alias("median_price"),
        F.col("p90").alias("p90_price"),
        "min_price",
        "max_price",
    ).orderBy("status")


# -------------------------------------------------------------- pivot
@register(
    "q36_pivot_status_by_year",
    oracle="""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
           COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS F,
           COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS O,
           COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS P
    FROM orders GROUP BY yr ORDER BY yr
    """,
)
def q36_pivot_status_by_year(spark, sf_dir):
    t = load_tables(spark, sf_dir, ["orders"])
    return (
        t["orders"]
        .groupBy(F.year("o_orderdate").cast("int").alias("yr"))
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["F", "O", "P"])
        .orderBy("yr")
    )


# ----------------------------------------- SQL pass-through (J2 surface)
_Q37_SQL = """
    SELECT o_orderpriority, COUNT(*) AS n
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_quantity > 45.0)
    GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


@register("q37_sql_passthrough", oracle=_Q37_SQL)
def q37_sql_passthrough(spark, sf_dir):
    """The reference's pass-through SQL home (J2): the IDENTICAL ANSI
    string runs on Spark SQL (over registered temp views) and on the
    DuckDB oracle."""
    load_tables(spark, sf_dir, ["orders", "lineitem"])
    return spark.sql(_Q37_SQL)


# ------------------------------------------------- intersect / except
@register(
    "q38_intersect_except",
    oracle="""
    SELECT 'both' AS bucket, COUNT(*) AS n FROM (
      SELECT c_nationkey FROM customer INTERSECT SELECT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'customer_only', COUNT(*) FROM (
      SELECT c_nationkey FROM customer EXCEPT SELECT s_nationkey FROM supplier)
    ORDER BY bucket
    """,
)
def q38_intersect_except(spark, sf_dir):
    t = load_tables(spark, sf_dir, ["customer", "supplier"])
    c = t["customer"].select("c_nationkey")
    s = t["supplier"].select(F.col("s_nationkey").alias("c_nationkey"))
    both = c.intersect(s).agg(F.count(F.lit(1)).alias("n")).select(F.lit("both").alias("bucket"), "n")
    # subtract = EXCEPT (set semantics); exceptAll would leave keys whose
    # multiplicity merely exceeds the supplier side's
    only = c.subtract(s).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("customer_only").alias("bucket"), "n"
    )
    return both.unionByName(only).orderBy("bucket")


# ------------------------------------------ window frames: moving aggregate
@register(
    "q40_moving_window_frame",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS day_total,
             COUNT(*) AS n
      FROM orders GROUP BY d
    )
    SELECT strftime(d, '%Y%m%d') AS date, n,
           CAST(CAST(day_total AS VARCHAR) AS DOUBLE) AS day_total,
           CAST(CAST(SUM(day_total) OVER (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE) AS total_7d,
           CAST(CAST(FIRST_VALUE(day_total) OVER (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE) AS window_first
    FROM daily ORDER BY date
    """,
)
def q40_moving_window_frame(spark, sf_dir):
    """Sliding ROWS frame over a pre-aggregated daily series (the
    7-day-total pattern). The global orderBy window runs single-partition
    by design — it operates on the DAILY rollup (bounded rows), never on
    raw facts; the heavy reduction happens in the partitioned groupBy."""
    t = load_tables(spark, sf_dir, ["orders"])
    daily = (
        t["orders"]
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("day_total"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    w = Window.orderBy("d").rowsBetween(-6, 0)
    return daily.select(
        F.date_format("d", "yyyyMMdd").alias("date"),
        "n",
        F.col("day_total").cast("double").alias("day_total"),
        F.sum("day_total").over(w).cast("double").alias("total_7d"),
        F.first("day_total").over(w).cast("double").alias("window_first"),
    ).orderBy("date")


# ----------------------------------------------------------- histogram
@register(
    "q41_price_histogram",
    oracle="""
    SELECT CAST(floor((o_totalprice - 0.0) / 25000.0) AS INT) AS bucket,
           COUNT(*) AS n,
           MIN(o_totalprice) AS lo,
           MAX(o_totalprice) AS hi
    FROM orders GROUP BY bucket ORDER BY bucket
    """,
)
def q41_price_histogram(spark, sf_dir):
    """Fixed-width histogram in one aggregation pass; the bucket id is
    plain double arithmetic + floor (deterministic on both engines —
    no log/ntile, whose implementations differ in ulps)."""
    t = load_tables(spark, sf_dir, ["orders"])
    bucket = F.floor((F.col("o_totalprice") - 0.0) / 25000.0).cast("int")
    return (
        t["orders"]
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
        .orderBy("bucket")
    )


# ----------------------------------------- deterministic list aggregation
@register(
    "q48_sorted_string_agg",
    oracle="""
    SELECT r_name AS region,
           string_agg(n_name, ',' ORDER BY n_name) AS nations,
           COUNT(*) AS n
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name ORDER BY region
    """,
)
def q48_sorted_string_agg(spark, sf_dir):
    """Order-insensitive collect: sort the collected list before joining
    so the aggregated string is deterministic under any partitioning
    (raw collect_list order is partition-dependent)."""
    t = load_tables(spark, sf_dir, ["nation", "region"])
    return (
        t["nation"]
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_list("n_name"))).alias("nations"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("region")
    )


# -------------------------------------------------- regex field extraction
@register(
    "q49_regex_extraction",
    oracle="""
    SELECT CAST(regexp_extract(source, 'src(\\d+)', 1) AS INT) AS src_num,
           CASE WHEN regexp_matches(p_type, '^STANDARD') THEN 'standard' ELSE 'other' END AS type_class,
           COUNT(*) AS n
    FROM documents, part
    WHERE doc_id % 50 = 0 AND p_partkey % 100 = 0
    GROUP BY src_num, type_class ORDER BY src_num, type_class
    """,
)
def q49_regex_extraction(spark, sf_dir):
    """Regex field parsing inside the scan projection (the ETL staple);
    the deliberate tiny cross join exercises the nested-loop path."""
    t = load_tables(spark, sf_dir, ["documents", "part"])
    docs = t["documents"].where(F.col("doc_id") % 50 == 0)
    parts = t["part"].where(F.col("p_partkey") % 100 == 0)
    return (
        docs.crossJoin(parts)
        .groupBy(
            F.regexp_extract("source", r"src(\d+)", 1).cast("int").alias("src_num"),
            F.when(F.col("p_type").rlike("^STANDARD"), "standard").otherwise("other").alias("type_class"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("src_num", "type_class")
    )


# ---------------------------------------- salted hot-key aggregation (q50)
@register(
    "q50_salted_aggregation",
    oracle="""
    SELECT l_returnflag AS k,
           COUNT(*) AS n,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS total
    FROM lineitem GROUP BY k ORDER BY k
    """,
)
def q50_salted_aggregation(spark, sf_dir):
    """Hot-key aggregation through the two-stage salted path (16-way
    partial per salt, then final merge): the oracle is the PLAIN group
    by — asserting that salting changes the physical distribution and
    nothing else. l_returnflag has 3 values over millions of rows: the
    textbook skewed groupBy."""
    from etl_wrap_spark.operators.skew import salted_agg_count_sum

    t = load_tables(spark, sf_dir, ["lineitem"])
    li = t["lineitem"].select(
        "l_returnflag", F.col("l_orderkey").alias("uid"),
        F.col("l_quantity").cast("decimal(18,4)").alias("qty"),
    )
    out = salted_agg_count_sum(li, ["l_returnflag"], "qty", "uid", buckets=16)
    return out.select(
        F.col("l_returnflag").alias("k"),
        "n",
        F.col("total").cast("double").alias("total"),
    ).orderBy("k")
