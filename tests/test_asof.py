"""Unit tests for the as-of join operator (merge_asof backward
semantics: latest right at-or-before each left row, per key)."""

from pyspark.sql import functions as F

from etl_wrap_spark.operators.asof import asof_join


def _run(spark, left_rows, right_rows):
    left = spark.createDataFrame(left_rows, ["k", "lt", "lval"])
    right = spark.createDataFrame(right_rows, ["k", "rt", "rval"])
    out = asof_join(left, right, on=["k"], left_ts="lt", right_ts="rt", right_payload=["rt", "rval"])
    return {(r["k"], r["lt"]): (r["rt"], r["rval"]) for r in out.collect()}


def test_backward_match_and_no_match(spark):
    got = _run(
        spark,
        [(1, 10, "a"), (1, 2, "b"), (2, 5, "c")],
        [(1, 3, "x"), (1, 7, "y"), (2, 9, "z")],
    )
    assert got[(1, 10)] == (7, "y")  # latest at-or-before 10
    assert got[(1, 2)] == (None, None)  # nothing before 2
    assert got[(2, 5)] == (None, None)  # right row is after


def test_exact_match_included(spark):
    got = _run(spark, [(1, 7, "a")], [(1, 7, "x"), (1, 5, "w")])
    assert got[(1, 7)] == (7, "x")


def test_null_payload_still_matches(spark):
    # a right row with NULL payload members IS the match — it must not be
    # skipped in favor of an older non-null row
    got = _run(spark, [(1, 10, "a")], [(1, 8, None), (1, 3, "old")])
    assert got[(1, 10)] == (8, None)


def test_all_left_rows_survive(spark):
    left = [(i % 3, i, f"v{i}") for i in range(30)]
    right = [(0, 5, "r")]
    assert len(_run(spark, left, right)) == 30


def test_tolerance(spark):
    from pyspark.sql import functions as F

    left = spark.createDataFrame([(1, 100, "a"), (1, 10, "b")], ["k", "lt", "lval"])
    right = spark.createDataFrame([(1, 8, "x")], ["k", "rt", "rval"])
    out = asof_join(
        left, right, on=["k"], left_ts="lt", right_ts="rt",
        right_payload=["rt", "rval"], tolerance=F.lit(5),
    )
    got = {r["lt"]: (r["rt"], r["rval"]) for r in out.collect()}
    assert got[10] == (8, "x")  # within 5
    assert got[100] == (None, None)  # match exists but is stale


def test_matches_pandas_merge_asof(spark):
    """Randomized cross-check against pandas.merge_asof (independent
    reference implementation, backward direction, exact matches on)."""
    import random

    import pandas as pd

    rng = random.Random(1234)
    left_rows = [(rng.randrange(5), rng.randrange(1000), i) for i in range(300)]
    right_rows = []
    seen = set()
    for j in range(200):
        k, t = rng.randrange(5), rng.randrange(1000)
        if (k, t) in seen:  # operator contract: unique right (key, ts)
            continue
        seen.add((k, t))
        right_rows.append((k, t, j))
    left = spark.createDataFrame(left_rows, ["k", "lt", "lid"])
    right = spark.createDataFrame(right_rows, ["k", "rt", "rid"])
    got = {
        r["lid"]: r["rid"]
        for r in asof_join(left, right, on=["k"], left_ts="lt", right_ts="rt",
                           right_payload=["rid"]).collect()
    }
    lpd = pd.DataFrame(left_rows, columns=["k", "lt", "lid"]).sort_values("lt", kind="stable")
    rpd = pd.DataFrame(right_rows, columns=["k", "rt", "rid"]).sort_values("rt", kind="stable")
    merged = pd.merge_asof(lpd, rpd, left_on="lt", right_on="rt", by="k", direction="backward")
    want = {
        int(r.lid): (None if pd.isna(r.rid) else int(r.rid)) for r in merged.itertuples()
    }
    assert got == want


def test_resample_ffill_semantics(spark):
    from etl_wrap_spark.operators.asof import resample_ffill

    obs = spark.createDataFrame(
        [
            (1, "2024-01-01 00:10:00", 10.0),
            (1, "2024-01-01 01:55:00", 20.0),
            (2, "2024-01-01 02:05:00", 99.0),
        ],
        "k int, ts string, v double",
    ).select("k", F.col("ts").cast("timestamp").alias("ts"), "v")
    out = resample_ffill(
        obs, "k", "ts", ["v"], step="1 hour",
        start="2024-01-01 00:00:00", end="2024-01-01 03:00:00",
    )
    got = {(r["k"], str(r["ts"])): r["v"] for r in out.collect()}
    assert got[(1, "2024-01-01 00:00:00")] is None      # before first obs
    assert got[(1, "2024-01-01 01:00:00")] == 10.0      # ffill
    assert got[(1, "2024-01-01 02:00:00")] == 20.0      # newer obs wins
    assert got[(1, "2024-01-01 03:00:00")] == 20.0      # carries forward
    assert got[(2, "2024-01-01 00:00:00")] is None
    assert got[(2, "2024-01-01 03:00:00")] == 99.0
    assert len(got) == 8                                 # 4 points x 2 keys

    # auto bounds: each key spans its own [min, max]
    auto = resample_ffill(obs, "k", "ts", ["v"], step="1 hour")
    per_key = {}
    for r in auto.collect():
        per_key.setdefault(r["k"], []).append(str(r["ts"]))
    assert per_key[1][0] == "2024-01-01 00:10:00"        # grid starts at min(ts)
    assert len(per_key[2]) == 1                          # single-obs key: one point
