"""Table profiling: per-column stats in ONE pass — the first thing an
ETL engineer runs against an unfamiliar 100 TB table.

Output is long-form (one row per column) so downstream checks join on
the column name. All stats ride a single aggregation; the exact
distinct counts use Spark's expand-based multi-distinct (row
multiplication by the number of distinct aggs — fine for profiling
runs), and `approx=True` swaps in HLL sketches
(approx_count_distinct) for a strictly single-expansion pass at
cluster scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NUMERIC = ("int", "bigint", "smallint", "tinyint", "double", "float", "decimal")


def _render(c, dtype: str, decimals: int):
    """Engine-portable value rendering: numerics via a fixed-scale
    decimal (both Spark and DuckDB print '123.45'), everything else by
    its string form. Raw double→string is NOT portable (scientific-
    notation thresholds differ between engines). Applied AFTER the
    min/max aggregation — aggregating rendered strings would compare
    lexicographically ('-107.30' < '-994.28')."""
    if any(dtype.startswith(t) for t in _NUMERIC):
        return c.cast(f"decimal(18,{decimals})").cast("string")
    return c.cast("string")


def profile(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    decimals: int = 2,
    approx: bool = False,
) -> DataFrame:
    """→ (column, n_rows, n_nulls, n_distinct, min_val, max_val), one
    row per profiled column, computed in one aggregation pass."""
    dtypes = dict(df.dtypes)
    names = list(cols) if cols is not None else list(df.columns)
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in names:
        nd = F.approx_count_distinct(c) if approx else F.countDistinct(c)
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).alias(f"__nulls_{c}"),
            nd.alias(f"__nd_{c}"),
            F.min(c).alias(f"__min_{c}"),
            F.max(c).alias(f"__max_{c}"),
        ]
    one = df.agg(*aggs)
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("column"),
                    F.col("__rows").cast("bigint").alias("n_rows"),
                    F.col(f"__nulls_{c}").cast("bigint").alias("n_nulls"),
                    F.col(f"__nd_{c}").cast("bigint").alias("n_distinct"),
                    _render(F.col(f"__min_{c}"), dtypes[c], decimals).alias("min_val"),
                    _render(F.col(f"__max_{c}"), dtypes[c], decimals).alias("max_val"),
                )
                for c in names
            ]
        )
    ).alias("p")
    return one.select(rows).select("p.*")
