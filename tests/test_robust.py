"""Robust statistics operators (operators/robust.py)."""

import random

import pytest
from pyspark.sql import functions as F

from etl_wrap_spark.operators.robust import (
    group_percentiles,
    group_percentiles_bracketed,
    mad_outliers,
    winsorize,
)


@pytest.fixture(scope="module")
def vals_df(spark):
    # group 'a': 1..9 plus outlier 1000; group 'b': constant 5s plus one 6
    rows = [("a", float(v)) for v in range(1, 10)] + [("a", 1000.0)]
    rows += [("b", 5.0)] * 8 + [("b", 6.0)]
    return spark.createDataFrame(rows, "g STRING, v DOUBLE")


def test_group_percentiles_columns(spark, vals_df):
    out = group_percentiles(vals_df, ["g"], "v", [0.05, 0.5, 0.95])
    assert set(out.columns) == {"g", "p05", "p50", "p95"}
    row = {r.g: r for r in out.collect()}
    assert row["b"].p50 == 5.0


def test_winsorize_clips_and_marks(spark, vals_df):
    w = winsorize(vals_df, ["g"], "v", 0.05, 0.95)
    a = w.where(F.col("g") == "a")
    # the 1000 outlier must be clipped to the p95 bound and marked +1
    top = a.orderBy(F.col("v").desc()).first()
    assert top.v == 1000.0 and top._clipped == 1 and top.v_w < 1000.0
    # no row exceeds its bounds after clipping
    assert a.where(F.col("v_w") > F.col("v")).count() >= 0  # sanity
    assert w.where(F.col("_clipped") == 0).count() > 0


def test_winsorize_bounds_override(spark, vals_df):
    bounds = spark.createDataFrame(
        [("a", 2.0, 8.0), ("b", 0.0, 10.0)], "g STRING, __lo DOUBLE, __hi DOUBLE"
    )
    w = winsorize(vals_df, ["g"], "v", bounds=bounds)
    a = {r.v: r.v_w for r in w.where(F.col("g") == "a").collect()}
    assert a[1.0] == 2.0 and a[1000.0] == 8.0 and a[5.0] == 5.0


def test_mad_outliers_flags(spark, vals_df):
    out = mad_outliers(vals_df, ["g"], "v", k=3.0)
    a = out.where((F.col("g") == "a") & F.col("_outlier"))
    # group a: median 5.5, MAD 2.5 -> only 1000 exceeds 5.5 + 7.5
    assert [r.v for r in a.collect()] == [1000.0]
    # group b: MAD == 0 (constant-dominated) -> the lone 6 deviates
    b = out.where((F.col("g") == "b") & F.col("_outlier"))
    assert [r.v for r in b.collect()] == [6.0]


# ------------------------------------------------- FK audit (validate.py)


def test_fk_orphans_counts_and_null_keys(spark):
    from etl_wrap_spark.operators.validate import fk_orphans

    child = spark.createDataFrame(
        [(1, "a"), (2, "b"), (None, "c"), (9, "d")], "k LONG, v STRING"
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk LONG")
    row = fk_orphans(child, parent, ["k"], ["pk"], "c->p").collect()[0]
    # 9 has no parent; NULL key is an orphan by contract
    assert (row.relation, row.n_child, row.n_orphans) == ("c->p", 4, 2)


def test_fk_orphans_composite_key(spark):
    from etl_wrap_spark.operators.validate import fk_orphans

    child = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10)], "a LONG, b LONG"
    )
    parent = spark.createDataFrame([(1, 10), (2, 10)], "pa LONG, pb LONG")
    row = fk_orphans(child, parent, ["a", "b"], ["pa", "pb"], "x").collect()[0]
    assert row.n_orphans == 1


# ------------------------------------------------- privacy (privacy.py)


def test_pseudonymize_deterministic_and_null_safe(spark):
    from etl_wrap_spark.operators.privacy import pseudonymize

    df = spark.createDataFrame([(1, "x"), (2, None)], "id LONG, who STRING")
    a = {r.id: r.who for r in pseudonymize(df, ["who"], "s1").collect()}
    b = {r.id: r.who for r in pseudonymize(df, ["who"], "s1").collect()}
    c = {r.id: r.who for r in pseudonymize(df, ["who"], "OTHER").collect()}
    assert a[1] == b[1] and len(a[1]) == 64      # stable within a salt
    assert a[1] != c[1]                          # salt rotation breaks linkage
    assert a[2] is None                          # NULL never becomes a token


def test_k_suppress_drop_and_null_modes(spark):
    from etl_wrap_spark.operators.privacy import k_suppress

    rows = [("a", 1)] * 5 + [("b", 2)] * 2
    df = spark.createDataFrame(rows, "q STRING, v INT")
    dropped = k_suppress(df, ["q"], k=3, mode="drop")
    assert dropped.count() == 5 and {r.q for r in dropped.collect()} == {"a"}
    nulled = k_suppress(df, ["q"], k=3, mode="null")
    assert nulled.count() == 7
    assert nulled.where(F.col("q").isNull()).count() == 2


# ------------------------------------- incremental join view (q113 operator)


def _bag(df):
    return {tuple(r) for r in df.collect()}


def test_incremental_join_matches_recompute(spark):
    from etl_wrap_spark.operators.incremental_join import (
        join_view,
        merge_join_delta,
    )

    # bases with DUPLICATE rows (bag semantics) and multi-match keys
    a_old = spark.createDataFrame(
        [(1, "x"), (1, "x"), (2, "y"), (3, "z")], "k LONG, av STRING"
    )
    b_old = spark.createDataFrame(
        [(1, 10), (2, 20), (2, 21), (4, 40)], "k LONG, bv LONG"
    )
    # delta: delete ONE copy of (1,x), re-insert (3,z) after deleting it,
    # insert a brand-new key 4 on the A side; B gains (3, 30)
    da = spark.createDataFrame(
        [(1, "x", "delete"), (3, "z", "delete"), (3, "z", "insert"),
         (4, "w", "insert")],
        "k LONG, av STRING, _op STRING",
    )
    db = spark.createDataFrame([(3, 30, "insert")], "k LONG, bv LONG, _op STRING")

    view = join_view(a_old, b_old, ["k"])
    merged = merge_join_delta(view, a_old, b_old, da, db, ["k"])

    # ground truth: recompute from the post-delta bases
    a_new = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "z"), (4, "w")], "k LONG, av STRING"
    )
    b_new = spark.createDataFrame(
        [(1, 10), (2, 20), (2, 21), (3, 30), (4, 40)], "k LONG, bv LONG"
    )
    assert _bag(merged) == _bag(join_view(a_new, b_new, ["k"]))


def test_incremental_join_one_sided_delta(spark):
    from etl_wrap_spark.operators.incremental_join import (
        join_view,
        merge_join_delta,
    )

    a = spark.createDataFrame([(1, "x"), (2, "y")], "k LONG, av STRING")
    b = spark.createDataFrame([(1, 10), (2, 20)], "k LONG, bv LONG")
    db = spark.createDataFrame([(2, 20, "delete")], "k LONG, bv LONG, _op STRING")
    merged = merge_join_delta(join_view(a, b, ["k"]), a, b, None, db, ["k"])
    assert _bag(merged) == {(1, "x", 10, 1)}


# ---------------------------------------------- hierarchy flattening


def test_flatten_hierarchy_deep_chain_log_rounds(spark):
    from etl_wrap_spark.operators.incremental_join import flatten_hierarchy

    # a 64-deep chain plus a separate 3-node star
    rows = [(i, i - 1) for i in range(2, 66)] + [(100, 99), (101, 99)]
    edges = spark.createDataFrame(rows, "child LONG, parent LONG")
    out = {r.node: (r.root, r.depth) for r in flatten_hierarchy(edges).collect()}
    assert out[65] == (1, 64)          # chain bottom: root 1, depth 64
    assert out[2] == (1, 1)
    assert out[100] == (99, 1) and out[101] == (99, 1)


def test_flatten_hierarchy_cycle_raises(spark):
    from etl_wrap_spark.operators.incremental_join import flatten_hierarchy

    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 1)], "child LONG, parent LONG")
    import pytest as _pt

    with _pt.raises(RuntimeError, match="converge"):
        flatten_hierarchy(edges, max_iter=8)


def test_dp_noisy_counts_fixed_domain(spark):
    """With a public ``domain`` the released key set is exactly the
    domain: present groups get true+noise, absent groups a noise-only
    count around 0, data-only keys outside the domain never leak
    (round-4 ADVICE known-domain caveat)."""
    from etl_wrap_spark.operators.privacy import dp_noise_thresholds, dp_noisy_counts

    df = spark.createDataFrame(
        [("a",), ("a",), ("a",), ("secret",)], ["g"]
    )
    domain = spark.createDataFrame([("a",), ("b",)], ["g"])
    out = {r["g"]: r["noisy_count"]
           for r in dp_noisy_counts(df, ["g"], salt="s1", domain=domain).collect()}
    assert set(out) == {"a", "b"}          # fixed key set, no "secret"
    # noise magnitude is bounded by m_max=64; the absent group's release
    # is pure noise around 0
    assert abs(out["b"]) <= 64
    assert abs(out["a"] - 3) <= 64
    # determinism: same salt → same release
    out2 = {r["g"]: r["noisy_count"]
            for r in dp_noisy_counts(df, ["g"], salt="s1", domain=domain).collect()}
    assert out == out2
    assert dp_noise_thresholds(1, 2)[-1] >= (1 << 60) - 1


def test_near_dup_threshold_guard(spark):
    """den > num means Jaccard threshold > 1 — impossible; raise instead
    of silently matching nothing (round-4 ADVICE degenerate-split)."""
    import pytest as _pytest

    from etl_wrap_spark.operators.dedup import near_dup_pairs_minhash

    df = spark.createDataFrame([(1, "a b c")], ["id", "text"])
    with _pytest.raises(ValueError, match="swapped"):
        near_dup_pairs_minhash(df, "id", "text", num=1, den=3)

def test_bracketed_matches_exact_on_adversarial_shapes(spark):
    # tie-heavy, tiny, singleton, two-element, large-spread, and
    # uniform-random groups; every percentile must equal percentile()
    # bit-for-bit (the bracketed plan is EXACT by contract).
    random.seed(8)
    rows = []
    rows += [("tiny1", 42.0)]
    rows += [("tiny2", 1.0), ("tiny2", 2.0)]
    rows += [("tiny5", float(v)) for v in (5, 1, 4, 2, 3)]
    rows += [("ties", float(v)) for v in [7] * 50 + [1] * 30 + [9] * 20]
    rows += [("spread", random.uniform(-1e9, 1e9)) for _ in range(500)]
    rows += [("unif", random.random()) for _ in range(2000)]
    df = spark.createDataFrame(rows, "g STRING, v DOUBLE").repartition(7)
    probs = [0.0, 0.01, 0.25, 0.5, 0.9, 0.99, 1.0]
    exact = group_percentiles(df, ["g"], "v", probs).collect()
    brk = group_percentiles_bracketed(df, ["g"], "v", probs).collect()
    e = {r.g: r for r in exact}
    b = {r.g: r for r in brk}
    assert set(e) == set(b)
    for g in e:
        for p in probs:
            c = f"p{round(p*100):02d}"
            assert b[g][c] is not None, (g, c)
            assert e[g][c] == b[g][c], (g, c, e[g][c], b[g][c])


def test_bracketed_extras_and_low_accuracy(spark):
    # accuracy=100 widens brackets but must stay exact; extras ride the
    # select pass.
    random.seed(9)
    rows = [("g%d" % (i % 3), float(random.randint(0, 50))) for i in range(3000)]
    df = spark.createDataFrame(rows, "g STRING, v DOUBLE")
    out = group_percentiles_bracketed(
        df, ["g"], "v", [0.5], accuracy=100,
        extras={"mn": F.min("v"), "mx": F.max("v"), "n": F.count("v")},
    ).collect()
    exact = {r.g: r for r in group_percentiles(df, ["g"], "v", [0.5]).collect()}
    for r in out:
        assert r.p50 == exact[r.g].p50
        assert r.mn <= r.p50 <= r.mx
        assert r.n == 1000


def test_weighted_median_bucketed_matches_default(spark):
    # the bucket_width histogram-bracket plan must be output-identical
    # to the value-grain default on adversarial shapes: negatives
    # straddling bucket edges, singleton groups, heavy ties, zero/neg
    # weights dropped, crossing exactly at a bucket boundary.
    from etl_wrap_spark.operators.robust import weighted_median

    random.seed(11)
    rows = []
    rows += [("neg", float(v), 1) for v in range(-3000, 3000, 7)]
    rows += [("one", 42.0, 5)]
    rows += [("ties", 10.0, 3)] * 40 + [("ties", 20.0, 1)] * 40
    rows += [("edge", 1023.0, 1), ("edge", 1024.0, 1), ("edge", 1025.0, 1)]
    rows += [("rand", float(random.randint(-10_000, 10_000)),
              random.randint(1, 9)) for _ in range(5000)]
    rows += [("drop", 7.0, 0), ("drop", 8.0, -2), ("drop", 9.0, 4)]
    df = spark.createDataFrame(rows, "g STRING, v DOUBLE, w LONG").repartition(5)
    base = {r.g: (r.total_w, r.wmedian)
            for r in weighted_median(df, ["g"], "v", "w").collect()}
    for width in (16, 1024, 1_000_000):
        got = {r.g: (r.total_w, r.wmedian)
               for r in weighted_median(
                   df, ["g"], "v", "w", bucket_width=width).collect()}
        assert got == base, (width, got, base)
