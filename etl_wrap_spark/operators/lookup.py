"""Lookup enrichment (SURVEY §2.5 J1) — the reference's only join:
a keyed lookup hash (readFromDBHash, Wrap/DB.pm:102-130) consulted
per row during reads (Wrap.pm:302-309).

Spark-first form: an explicit broadcast hash join of the (small) lookup
frame — the fact side is never shuffled, at any scale. The reference's
'key not found' rows simply kept their fields empty; here that policy
is explicit: left join (NULLs), inner (drop), or quarantine (split)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich(
    df: DataFrame,
    lookup: DataFrame,
    on: Sequence[str] | dict[str, str],
    select: Sequence[str] | None = None,
    missing: str = "keep",
) -> DataFrame | tuple[DataFrame, DataFrame]:
    """Broadcast-join `lookup` onto `df`.

    `on`: join column names, or a {df_col: lookup_col} mapping.
    `select`: lookup columns to attach (default: all non-key columns).
    `missing`: 'keep' (left join, NULL fills), 'drop' (inner join), or
    'quarantine' (returns (matched, unmatched) pair).
    """
    if isinstance(on, dict):
        lk = lookup
        for df_col, lk_col in on.items():
            if lk_col != df_col:
                lk = lk.withColumnRenamed(lk_col, df_col)
        keys = list(on.keys())
    else:
        lk = lookup
        keys = list(on)
    if select is not None:
        lk = lk.select(*keys, *select)
    # one row per key — fetchall_hashref semantics (last-in wins is
    # undefined in the reference; first deterministically here)
    lk = lk.dropDuplicates(keys)
    if missing == "drop":
        return df.join(F.broadcast(lk), on=keys, how="inner")
    joined = df.join(F.broadcast(lk), on=keys, how="left")
    if missing == "keep":
        return joined
    if missing == "quarantine":
        probe = [c for c in lk.columns if c not in keys]
        hit = F.lit(False)
        for c in probe:
            hit = hit | F.col(c).isNotNull()
        return joined.where(hit), joined.where(~hit)
    raise ValueError(f"missing policy {missing!r} not in keep/drop/quarantine")
