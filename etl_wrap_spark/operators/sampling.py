"""Dataset splitting, stratified sampling, and sequence packing for
training-data pipelines (SURVEY §7.1 M9).

Everything is DETERMINISTIC-BY-HASH, never `rand()`: the same row gets
the same split/sample decision on every run, executor, and retry — the
property that makes 100-TB dataset builds reproducible and resumable.
Hashes are the engine's portable md5-60 (operators/text.hash60), so an
independent engine reproduces the exact assignment.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_wrap_spark.operators.text import hash60

SPLIT_BUCKETS = 10_000


def split_bucket(id_col: Column | str, salt: str = "split") -> Column:
    """Stable bucket in [0, 10000) from the row id + salt (change the
    salt to draw an independent split)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return hash60(F.concat(F.lit(salt + ":"), c.cast("string"))) % SPLIT_BUCKETS


def assign_split(
    df: DataFrame,
    id_col: str,
    weights: Sequence[tuple[str, float]] = (("train", 0.8), ("val", 0.1), ("test", 0.1)),
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment by cumulative bucket
    thresholds; weights must sum to 1."""
    total = sum(w for _, w in weights)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    b = split_bucket(id_col, salt)
    expr = None
    acc = 0.0
    for name, w in weights:
        acc += w
        bound = int(round(acc * SPLIT_BUCKETS))
        cond = b < bound
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return df.withColumn(out_col, expr)


def stratified_sample(
    df: DataFrame, stratum_col: str, id_col: str, k: int, salt: str = "sample"
) -> DataFrame:
    """Exactly-k-per-stratum deterministic sample: rank rows inside each
    stratum by (hash, id) and keep the first k. One shuffle on the
    stratum; reproducible across runs/engines."""
    h = hash60(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    w = Window.partitionBy(stratum_col).orderBy(h, F.col(id_col))
    return df.withColumn("__rk", F.row_number().over(w)).where(F.col("__rk") <= k).drop("__rk")


def pack_sequences(
    df: DataFrame,
    group_col: str,
    order_col: str,
    size_col: Column | str,
    bin_capacity: int,
    out_col: str = "bin",
) -> DataFrame:
    """Deterministic sequence packing: within each group, walk rows in
    `order_col` order and assign bin = floor(exclusive-prefix-sum /
    capacity) — contiguous bins of ~`bin_capacity` total size (a single
    oversized row still gets a bin; bins can overflow by at most one
    row, the standard streaming-packing compromise).

    One shuffle on the group; the cumulative window is linear per
    group. This is the batch-shaping step before training (token-budget
    bins), expressed as pure window algebra."""
    c = F.col(size_col) if isinstance(size_col, str) else size_col
    w = Window.partitionBy(group_col).orderBy(order_col).rowsBetween(Window.unboundedPreceding, -1)
    prefix = F.coalesce(F.sum(c).over(w), F.lit(0))
    return df.withColumn(out_col, F.floor(prefix / bin_capacity).cast("int"))
