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


def waterfall_enrich(
    base: DataFrame,
    sources: "list[tuple[DataFrame, str]]",
    key_col: str,
    value_col: str,
    out_col: str = "value",
    provenance_col: str = "source",
) -> DataFrame:
    """PRIORITY-fallback enrichment — the MDM waterfall: try source 1,
    fall back to source 2, then 3 … recording which source won.
    ``sources`` is an ordered list of (frame, source_name); each frame
    carries (key_col, value_col) with at most one row per key (enforce
    upstream or with lookup.enrich's which-row-wins policies).

    Plan: one LEFT broadcast join per source (reference-data frames are
    small by contract) and a single COALESCE across the joined values —
    no unions, no per-row conditionals beyond the coalesce; provenance
    derives from the same null pattern, so it can never disagree with
    the chosen value."""
    joined = base
    val_cols = []
    for i, (src, _name) in enumerate(sources):
        slim = src.select(
            F.col(key_col), F.col(value_col).alias(f"__v{i}")
        )
        joined = joined.join(F.broadcast(slim), on=key_col, how="left")
        val_cols.append(F.col(f"__v{i}"))
    value = F.coalesce(*val_cols)
    # first-match-wins when-chain, same precedence as the coalesce
    prov_expr = None
    for i, (_src, name) in enumerate(sources):
        c = F.col(f"__v{i}").isNotNull()
        prov_expr = F.when(c, F.lit(name)) if prov_expr is None else prov_expr.when(c, F.lit(name))
    out = joined.withColumn(out_col, value).withColumn(
        provenance_col, prov_expr
    )
    return out.drop(*[f"__v{i}" for i in range(len(sources))])
