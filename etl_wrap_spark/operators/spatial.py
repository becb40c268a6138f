"""Spatial self-join — radius search over 2D points via grid-cell
bucketing, the celled-candidate-generation shape (same family as the
LSH band join in operators/dedup.py: bucket, join buckets, verify
exactly — never all pairs).

A training/analytics pipeline meets this as geo joins (stores within
5 km), embedding-projection neighborhoods, and sensor proximity. The
method is public textbook spatial hashing: cell side = radius, so any
pair within the radius sits in the same or an adjacent cell — the
3×3 neighborhood join is exhaustive, and the exact distance filter
removes false candidates.

Scale shape: each left row explodes to its 9 candidate cells (map-
side, constant factor), both sides shuffle ONCE on the cell key, and
per-cell work is |cell|² only within the local density — a uniform
corpus keeps cells O(1), and a pathological hot cell is visible in
the cell histogram (pair with skew.py salting if needed). No driver
work, no UDFs: cell ids and distances are Column arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def radius_join_2d(
    df: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    radius: float,
) -> DataFrame:
    """All pairs within Euclidean ``radius`` → (id_a, id_b, dist2) with
    id_a < id_b, dist2 the squared distance as double (both engines
    evaluate the identical (dx·dx + dy·dy) tree, so it is
    bit-deterministic; callers wanting the distance take sqrt —
    comparisons should stay on dist2).

    Each unordered pair is produced exactly once: the exploded side
    covers the partner's cell exactly once, and the id_a < id_b filter
    drops the mirror image found from the partner's own expansion."""
    if radius <= 0:
        raise ValueError("radius must be positive")
    pts = df.select(
        F.col(id_col).alias("__id"),
        F.col(x_col).cast("double").alias("__x"),
        F.col(y_col).cast("double").alias("__y"),
    ).withColumns(
        {
            "__cx": F.floor(F.col("__x") / radius).cast("bigint"),
            "__cy": F.floor(F.col("__y") / radius).cast("bigint"),
        }
    )
    nbr = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    left = pts.select(
        F.col("__id").alias("id_a"),
        F.col("__x").alias("__xa"),
        F.col("__y").alias("__ya"),
        "__cx",
        "__cy",
        F.explode(nbr).alias("__o"),
    ).select(
        "id_a",
        "__xa",
        "__ya",
        (F.col("__cx") + F.col("__o.dx")).alias("__jx"),
        (F.col("__cy") + F.col("__o.dy")).alias("__jy"),
    )
    right = pts.select(
        F.col("__id").alias("id_b"),
        F.col("__x").alias("__xb"),
        F.col("__y").alias("__yb"),
        F.col("__cx").alias("__jx"),
        F.col("__cy").alias("__jy"),
    )
    dx = F.col("__xa") - F.col("__xb")
    dy = F.col("__ya") - F.col("__yb")
    dist2 = dx * dx + dy * dy
    return (
        left.join(right, on=["__jx", "__jy"])
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("dist2", dist2)
        .where(F.col("dist2") <= F.lit(radius) * F.lit(radius))
        .select("id_a", "id_b", "dist2")
    )


def morton_key_expr(x: Column | str, y: Column | str, bits: int = 16) -> Column:
    """Z-order (Morton) interleave of two non-negative ints → bigint
    key; x takes the even bit positions, y the odd. The lakehouse
    multi-column clustering key: files written in morton-key order get
    TIGHT zone maps on BOTH dimensions simultaneously (a single-column
    sort leaves the other column's per-file [min,max] spanning the full
    range, so zone-map pruning only ever helps one predicate — the
    prefix of the curve bounds a quadtree cell, so every contiguous key
    range bounds both columns).

    Unrolled shift-and-or tree over ``bits`` positions (default 16 →
    32-bit keys): pure integer ops, bit-identical on any engine —
    ``morton_key_sql`` emits the same tree for the DuckDB oracle.
    Inputs MUST be in [0, 2^bits); quantize wider domains first (the
    caller owns the quantization, e.g. ``value div step`` — rank-based
    quantiles make the curve adaptive but cost a pass). 2·bits <= 62.
    """
    from etl_wrap_spark.sinks.parquet import zorder_key

    # ONE interleave definition repo-wide: delegate to the lake write
    # path's clustering key (sinks/parquet.py:zorder_key — x even bits,
    # y odd under its i + j*n layout). This surface fixes n=2 and adds
    # the SQL twin; zorder_key CLAMPS out-of-range inputs to
    # [0, 2^bits), and morton_key_sql emits the same clamp.
    xc = F.col(x) if isinstance(x, str) else x
    yc = F.col(y) if isinstance(y, str) else y
    if 2 * bits > 62:
        raise ValueError("2*bits must be <= 62 to stay in int64")
    return zorder_key([xc, yc], bits)


def morton_key_sql(x: str, y: str, bits: int = 16) -> str:
    """The identical Morton-interleave tree (clamp included) as
    ANSI/DuckDB SQL — the oracle twin of ``morton_key_expr``."""
    mask = (1 << bits) - 1
    cx = f"least(greatest({x}, 0), {mask})"
    cy = f"least(greatest({y}, 0), {mask})"
    terms = []
    for i in range(bits):
        terms.append(f"((({cx} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({cy} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"
