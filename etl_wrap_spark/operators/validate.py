"""Declarative data-quality rule bank — expectation checks over a
frame in one pass, with per-row routing for quarantine.

The engine's coercion layer guards individual values
(functions/coerce.py length_guard / quarantine_split); this module is
the TABLE-level contract: a named list of conditions that must hold,
evaluated together so a 100 TB validation run is one scan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def rule_summary(df: DataFrame, rules: Sequence[tuple[str, Column]]) -> DataFrame:
    """→ (rule, n_rows, n_violations) per rule, single aggregation pass.
    A rule is a (name, condition-that-must-hold) pair; NULL condition
    results count as violations (unknown fails closed)."""
    aggs = [F.count(F.lit(1)).alias("__rows")] + [
        F.sum(F.when(F.coalesce(cond, F.lit(False)), 0).otherwise(1)).alias(f"__v{i}")
        for i, (_, cond) in enumerate(rules)
    ]
    one = df.agg(*aggs)
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(name).alias("rule"),
                    F.col("__rows").cast("bigint").alias("n_rows"),
                    F.col(f"__v{i}").cast("bigint").alias("n_violations"),
                )
                for i, (name, _) in enumerate(rules)
            ]
        )
    ).alias("r")
    return one.select(rows).select("r.*")


def annotate_violations(
    df: DataFrame, rules: Sequence[tuple[str, Column]], out_col: str = "failed_rules"
) -> DataFrame:
    """df + a comma-joined column of the rules each row fails (empty
    string = clean). Rides the scan projection; split on it with
    functions/coerce.py:quarantine_split for the route-don't-abort
    posture."""
    flags = [
        F.when(~F.coalesce(cond, F.lit(False)), F.lit(name)) for name, cond in rules
    ]
    return df.withColumn(out_col, F.concat_ws(",", *flags))


def fk_orphans(
    child: DataFrame,
    parent: DataFrame,
    child_keys: Sequence[str],
    parent_keys: Sequence[str],
    relation: str,
) -> DataFrame:
    """Referential-integrity audit for one FK relation → a 1-row frame
    (relation, n_child, n_orphans): child rows whose key has no parent.

    Shape at 100 TB: one LEFT ANTI join per relation — Catalyst
    broadcasts genuinely small parents and falls back to a shuffled
    hash join on the key otherwise (never a full sort); NULL child keys
    count as orphans (an FK that is NULL fails the contract — filter
    them upstream if the schema allows optional references). Union the
    per-relation frames for the whole-schema audit in one action.
    """
    ck, pk = list(child_keys), list(parent_keys)
    cond = [child[c].eqNullSafe(parent[p]) for c, p in zip(ck, pk, strict=True)]
    orphans = child.join(parent, cond, "left_anti")
    n_child = child.agg(F.count(F.lit(1)).cast("bigint").alias("n_child"))
    n_orph = orphans.agg(F.count(F.lit(1)).cast("bigint").alias("n_orphans"))
    return (
        n_child.crossJoin(n_orph)
        .select(F.lit(relation).alias("relation"), "n_child", "n_orphans")
    )


def join_fanout_audit(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    threshold: int = 1000,
) -> DataFrame:
    """Pre-join blowup audit → per join key (key…, n_left, n_right,
    fanout, over_threshold): the output cardinality each key would
    contribute to ``left JOIN right`` (n_left·n_right), BEFORE running
    the join. At 100 TB the single most expensive class of incident is
    a many-to-many key nobody knew about (a null-ish default, a
    catch-all id) exploding a join by 10^6x — this audit is two
    key-grain aggregations and a key-grain merge, so it costs a
    rounding error of the join it guards, and its output is exactly the
    rows a skew mitigation (salting, key quarantine) needs as input.
    Keys present on one side only are reported with the missing side at
    0 (fanout 0 — they produce no inner-join rows but do signal FK
    drift; cross-check fk_orphans)."""
    keys = list(key_cols)
    lc = left.groupBy(*keys).agg(F.count(F.lit(1)).cast("bigint").alias("n_left"))
    rc = right.groupBy(*keys).agg(F.count(F.lit(1)).cast("bigint").alias("n_right"))
    return (
        lc.join(rc, on=keys, how="full_outer")
        .select(
            *keys,
            F.coalesce("n_left", F.lit(0)).cast("bigint").alias("n_left"),
            F.coalesce("n_right", F.lit(0)).cast("bigint").alias("n_right"),
        )
        .withColumn("fanout", (F.col("n_left") * F.col("n_right")).cast("bigint"))
        .withColumn("over_threshold", F.col("fanout") > threshold)
    )


def reconcile(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    check_cols: Sequence[str],
) -> DataFrame:
    """Source-vs-target load reconciliation — the classic post-load ETL
    audit ("did everything that left the database arrive in the lake,
    unchanged?") → one row per checked column:
    (column, n_left, n_right, only_left, only_right, mismatched) where
    only_left/only_right count keys missing from the other side and
    mismatched counts keys present on both with different values
    (null-safe: NULL == NULL matches, NULL vs value mismatches).

    One full-outer join on the key + one aggregation — the mismatch
    flags are computed per column IN the same pass (sum-of-casts), so
    the audit costs one shuffle regardless of how many columns it
    checks. At 100 TB reconcile per partition/day slice rather than the
    whole table, and let AQE broadcast a genuinely small side. Keys
    must be unique per side (it is a KEY audit; pre-aggregate or
    dedupe first — a duplicate key would double-count mismatches)."""
    keys = list(key_cols)
    checks = list(check_cols)
    l = left.select(
        *[F.col(k).alias(k) for k in keys],
        F.lit(1).alias("__l"),
        *[F.col(c).alias(f"__lv_{c}") for c in checks],
    )
    r = right.select(
        *[F.col(k).alias(k) for k in keys],
        F.lit(1).alias("__r"),
        *[F.col(c).alias(f"__rv_{c}") for c in checks],
    )
    j = l.join(r, keys, "full_outer")
    both = F.col("__l").isNotNull() & F.col("__r").isNotNull()
    aggs = [
        F.sum(F.coalesce(F.col("__l"), F.lit(0))).cast("bigint").alias("n_left"),
        F.sum(F.coalesce(F.col("__r"), F.lit(0))).cast("bigint").alias("n_right"),
        F.sum((F.col("__r").isNull()).cast("int")).cast("bigint").alias("only_left"),
        F.sum((F.col("__l").isNull()).cast("int")).cast("bigint").alias("only_right"),
    ]
    for c in checks:
        diff = both & ~F.col(f"__lv_{c}").eqNullSafe(F.col(f"__rv_{c}"))
        aggs.append(F.sum(diff.cast("int")).cast("bigint").alias(f"__mm_{c}"))
    one = j.agg(*aggs)
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("column"),
                    F.col("n_left"),
                    F.col("n_right"),
                    F.col("only_left"),
                    F.col("only_right"),
                    F.col(f"__mm_{c}").alias("mismatched"),
                )
                for c in checks
            ]
        )
    ).alias("p")
    return one.select(rows).select("p.*")
