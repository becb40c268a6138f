"""Direct unit tests for the merge/load algebra (sinks/merge.py) — the
reference's upsert / update / delete / incremental semantics."""

import pytest
from pyspark.sql import functions as F

from etl_wrap_spark.sinks import merge


@pytest.fixture()
def target(spark):
    return spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], ["k", "name", "v"]
    )


def _rows(df):
    return {r["k"]: (r["name"], r["v"]) for r in df.collect()}


def test_upsert(spark, target):
    updates = spark.createDataFrame([(2, "B!", 99), (4, "d", 40)], ["k", "name", "v"])
    got = _rows(merge.upsert(target, updates, ["k"]))
    assert got == {1: ("a", 10), 2: ("B!", 99), 3: ("c", 30), 4: ("d", 40)}


def test_update_keys_full_and_incremental(spark, target):
    updates = spark.createDataFrame([(1, None, 11), (3, "C!", None)], ["k", "name", "v"])
    # full update: matched rows take update values, including NULLs
    full = _rows(merge.update_keys(target, updates, ["k"]))
    assert full[1] == (None, 11) and full[3] == ("C!", None) and full[2] == ("b", 20)
    # incremental: NULL update values leave the target value unchanged
    inc = _rows(merge.update_keys(target, updates, ["k"], incremental=True))
    assert inc[1] == ("a", 11) and inc[3] == ("C!", 30) and inc[2] == ("b", 20)


def test_delete_keys(spark, target):
    dels = spark.createDataFrame([(2,), (2,), (99,)], ["k"])
    got = _rows(merge.delete_keys(target, dels, ["k"]))
    assert set(got) == {1, 3}


def test_delete_before_insert_null_selector(spark, target):
    # rows where the selector is NULL must be KEPT (coalesce to false)
    tgt = target.withColumn("seg", F.when(F.col("k") == 1, "X"))
    repl = spark.createDataFrame([(9, "z", 90, "X")], ["k", "name", "v", "seg"])
    got = _rows(merge.delete_before_insert(tgt, repl, F.col("seg") == "X"))
    assert set(got) == {2, 3, 9}  # k=1 deleted (seg X), NULL-seg rows kept


def test_constant_identity_dedupe(spark, target):
    with_id = merge.append_with_constant(target, "load_id", "L42")
    assert with_id.select("load_id").distinct().collect()[0][0] == "L42"
    assert "v" not in merge.drop_identity(target, ["v", "nope"]).columns
    dup = target.unionByName(target)
    assert merge.dedupe_for_load(dup, ["k"]).count() == 3


def test_snapshot_diff_all_change_types(spark):
    from etl_wrap_spark.sinks.merge import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", None), (4, "d", 40)],
        ["k", "val", "num"],
    )
    new = spark.createDataFrame(
        [(2, "b", 20), (3, "c", 30), (4, "D", 40), (5, "e", 50)],
        ["k", "val", "num"],
    )
    got = {r["k"]: (r["change_type"], r["val"], r["num"])
           for r in snapshot_diff(old, new, keys=["k"]).collect()}
    assert got == {
        1: ("delete", "a", 10),
        3: ("update", "c", 30),   # NULL -> 30 counts as change (null-safe)
        4: ("update", "D", 40),
        5: ("insert", "e", 50),
    }  # k=2 unchanged -> absent
    # compare restricted to `num`: the d->D case-change disappears
    got2 = {r["k"] for r in snapshot_diff(old, new, keys=["k"], compare=["num"]).collect()}
    assert got2 == {1, 3, 5}


def test_scd2_two_batch_version_chain(spark):
    from etl_wrap_spark.sinks.merge import scd2_apply

    dim = spark.createDataFrame(
        [(1, "a", "2020-01-01", None, True), (2, "b", "2020-01-01", None, True)],
        "k int, v string, valid_from string, valid_to string, is_current boolean",
    )
    b1 = spark.createDataFrame(
        [(1, "a2", "2021-01-01"), (3, "c", "2021-01-01")], "k int, v string, eff string"
    )
    d1 = scd2_apply(dim, b1, ["k"], ["v"], "eff")
    b2 = spark.createDataFrame(
        [(1, "a3", "2022-01-01"), (2, "b", "2022-01-01")], "k int, v string, eff string"
    )
    d2 = scd2_apply(d1, b2, ["k"], ["v"], "eff")
    rows = sorted(
        ((r["k"], r["v"], r["valid_from"], r["valid_to"], r["is_current"])
         for r in d2.collect())
    )
    assert rows == [
        (1, "a", "2020-01-01", "2021-01-01", False),
        (1, "a2", "2021-01-01", "2022-01-01", False),
        (1, "a3", "2022-01-01", None, True),
        (2, "b", "2020-01-01", None, True),   # unchanged both times: no churn
        (3, "c", "2021-01-01", None, True),
    ]
    # invariant: exactly one current row per key; intervals stitch
    cur = [r for r in rows if r[4]]
    assert len({r[0] for r in cur}) == len(cur) == 3
