"""Incremental aggregate maintenance — merge a CDC delta into a standing
keyed aggregate WITHOUT recomputing from the full fact history.

The 100 TB pattern: a revenue-by-key rollup over years of facts is
petabyte-scan territory; the day's changes are gigabytes. For
sum/count-style (commutative group) aggregates the new state is pure
algebra over (old_state, delta_aggregate):

    inserts:  state += agg(rows)
    deletes:  state -= agg(rows)      (the group inverse)
    updates:  delete old image + insert new image

min/max are NOT incrementally maintainable under deletes (no inverse) —
that needs the fact history or a sketch; this module stays in the
invertible family and verifies exactness against full recompute
(catalog q86: merged state hash-equals the from-scratch aggregate).

Exactness: counts/sums merge in DECIMAL / BIGINT (order-independent);
never float accumulation.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def aggregate_state(
    facts: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str],
    count_col: str = "n_rows",
) -> DataFrame:
    """The maintainable state: per-key exact-decimal sums + row count."""
    aggs = [
        F.sum(F.col(c).cast("decimal(28,4)")).alias(f"sum_{c}") for c in sum_cols
    ] + [F.count(F.lit(1)).cast("bigint").alias(count_col)]
    return facts.groupBy(*keys).agg(*aggs)


def merge_delta(
    state: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str],
    count_col: str = "n_rows",
    op_col: str = "_op",
) -> DataFrame:
    """New state from old state + CDC delta rows.

    ``delta`` carries fact-grain rows plus ``op_col`` in
    {'insert','delete'}; an update is its delete+insert row pair (the
    standard CDC encoding, and what snapshot_diff emits). Deletes
    contribute NEGATED sums/counts; the plan aggregates the delta to
    per-key increments FIRST (map-side combine over the small side),
    then outer-merges with the state on one key shuffle — the state is
    never rescanned at fact grain. Keys whose count reaches zero drop
    out (full deletion of a group)."""
    sign = F.when(F.col(op_col) == "delete", F.lit(-1)).otherwise(F.lit(1))
    inc = delta.groupBy(*keys).agg(
        *[
            F.sum(F.col(c).cast("decimal(28,4)") * sign).alias(f"sum_{c}")
            for c in sum_cols
        ],
        F.sum(sign).cast("bigint").alias(count_col),
    )
    s = state.select(
        *keys,
        *[F.col(f"sum_{c}").alias(f"__s_sum_{c}") for c in sum_cols],
        F.col(count_col).alias("__s_n"),
    )
    merged = s.join(inc, on=list(keys), how="full_outer").select(
        *keys,
        *[
            (
                F.coalesce(F.col(f"__s_sum_{c}"), F.lit(0).cast("decimal(28,4)"))
                + F.coalesce(F.col(f"sum_{c}"), F.lit(0).cast("decimal(28,4)"))
            ).alias(f"sum_{c}")
            for c in sum_cols
        ],
        (
            F.coalesce(F.col("__s_n"), F.lit(0).cast("bigint"))
            + F.coalesce(F.col(count_col), F.lit(0).cast("bigint"))
        ).alias(count_col),
    )
    return merged.where(F.col(count_col) > 0)


def reconstruct_at(
    changes: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    as_of,
    change_type_col: str = "change_type",
) -> DataFrame:
    """Replay a CDC change log into the TABLE STATE as of a timestamp —
    the audit/backfill operator for pipelines that keep a change feed
    (sinks/lake.py:table_changes, Debezium streams) instead of full
    snapshots: for every key, the latest change at-or-before ``as_of``
    wins (window argmax per key — one shuffle on the key), and keys
    whose winning change is a delete drop out.

    ``changes`` rows carry the key, payload columns, ``ts_col`` and a
    ``change_type`` in {insert, update, delete} (exactly the CDF
    vocabulary). Ties on (key, ts) break by preferring the delete
    (the conservative read: a same-instant delete+insert reads as
    deleted; feed monotonic timestamps to avoid caring)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    keys = list(key_cols)
    w = Window.partitionBy(*keys).orderBy(
        F.col(ts_col).desc(), (F.col(change_type_col) != "delete").asc()
    )
    return (
        changes.where(F.col(ts_col) <= as_of)
        .withColumn("__rk", F.row_number().over(w))
        .where((F.col("__rk") == 1) & (F.col(change_type_col) != "delete"))
        .drop("__rk", change_type_col)
    )
