"""Skew-mitigation helpers (SURVEY 'Optimize for scale').

AQE's skew-join split handles most sort-merge skew at runtime; explicit
salting remains the tool when a HOT KEY dominates a shuffle-hash join or
aggregation (AQE cannot split a single key's hash bucket across
reducers for grouped aggregation).

`salted_join`: replicate the small side R times, salt the big side
uniformly — every (key, salt) shard is 1/R of the hot key's rows.
`salted_agg_count_sum`: two-stage aggregation (partial per salt →
final) for hot-key groupBys.

Salting uses a deterministic hash of a row-unique column (never
rand() — retries/speculative tasks must salt identically).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, unique_col: str, buckets: int, name: str = "__salt") -> DataFrame:
    """Deterministic salt in [0, buckets) from a row-unique column."""
    return df.withColumn(name, F.pmod(F.hash(F.col(unique_col)), F.lit(buckets)))


def explode_salt(df: DataFrame, buckets: int, name: str = "__salt") -> DataFrame:
    """Replicate each row once per salt value (the small/broadcastable
    side of a salted join)."""
    return df.withColumn(name, F.explode(F.array(*[F.lit(i) for i in range(buckets)])))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    big_unique_col: str,
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where `big` has skewed keys: join keys become
    (key..., salt); the hot key's rows spread over `buckets` reducers.

    Only big-side-preserving joins are valid: under right/full outer,
    every unmatched small-side row survives once PER (key, salt)
    replica — `buckets` phantom copies."""
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti", "cross"}
    if how not in allowed:
        raise ValueError(
            f"salted_join(how={how!r}): the exploded small side makes "
            f"right/full outer joins emit {buckets} copies of unmatched "
            f"small-side rows; use one of {sorted(allowed)}"
        )
    b = with_salt(big, big_unique_col, buckets)
    s = explode_salt(small, buckets)
    return b.join(s, on=[*on, "__salt"], how=how).drop("__salt")


def salted_agg_count_sum(
    df: DataFrame,
    keys: Sequence[str],
    sum_col: Column | str,
    unique_col: str,
    buckets: int = 16,
) -> DataFrame:
    """Hot-key groupBy as two stages: (keys, salt) partial aggregation →
    final merge on keys. Output: keys, n, total."""
    c = F.col(sum_col) if isinstance(sum_col, str) else sum_col
    partial = (
        with_salt(df, unique_col, buckets)
        .groupBy(*keys, "__salt")
        .agg(F.count(F.lit(1)).alias("__n"), F.sum(c).alias("__s"))
    )
    return partial.groupBy(*keys).agg(
        F.sum("__n").alias("n"), F.sum("__s").alias("total")
    )


def skew_report(df: DataFrame, keys: Sequence[str], top_k: int = 10):
    """Diagnose key skew before a join/groupBy → (top_keys frame,
    advisory dict).

    One counting aggregation; the advisory pulls THREE scalars to the
    driver (total, key count, max key count) plus the top-k hot keys —
    never the data. `suggested_buckets` is the replication factor at
    which the hottest key's shard equals an average key's load
    (ceil(max/avg), capped at 64: beyond that the small-side
    replication in salted_join costs more than residual imbalance).
    Feed it straight into salted_join/salted_agg_count_sum."""
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
    stats = counts.agg(
        F.sum("n").alias("total"), F.count(F.lit(1)).alias("nkeys"), F.max("n").alias("mx")
    ).first()
    total, nkeys, mx = stats["total"] or 0, stats["nkeys"] or 0, stats["mx"] or 0
    avg = (total / nkeys) if nkeys else 0.0
    skew_factor = (mx / avg) if avg else 0.0
    buckets = min(64, max(1, -(-int(mx) // max(1, int(avg))))) if avg else 1
    top = counts.orderBy(F.col("n").desc(), *keys).limit(top_k)
    advisory = {
        "total_rows": int(total),
        "distinct_keys": int(nkeys),
        "max_key_rows": int(mx),
        "skew_factor": round(skew_factor, 2),
        "suggested_buckets": int(buckets),
    }
    return top, advisory
