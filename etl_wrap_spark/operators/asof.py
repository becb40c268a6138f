"""As-of (point-in-time) join — an operator Spark's DataFrame API lacks
(SURVEY §4.2 'custom operators'): for each left row, attach the latest
right row with right_ts <= left_ts per key.

Scalable implementation (no range cross-join, no per-key loop): tag and
UNION both sides, then one window pass ordered by (key, ts) carries the
most recent right-side payload forward onto each left row — a single
shuffle on the key, linear work, no pair enumeration. This is the
standard distributed as-of pattern (pandas merge_asof semantics,
direction='backward', allow_exact_matches=True).

Right-side ties on (key, ts) must be resolved by the caller (e.g.
dedupe to the max sequence per timestamp) — like merge_asof, the
operator requires a unique right frame per (key, ts) for deterministic
output.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_payload: Sequence[str] | None = None,
    suffix: str = "_right",
    tolerance: Column | None = None,
) -> DataFrame:
    """Backward as-of join (latest right at-or-before each left row).

    Returns every left row with `right_payload` columns (default: all
    non-key, non-ts right columns) from the matched right row, NULL when
    no right row precedes it. With `tolerance` (an interval Column, e.g.
    ``F.expr("INTERVAL 2 HOURS")``), a match older than left_ts -
    tolerance is discarded (pandas merge_asof tolerance semantics).
    """
    on = list(on)
    payload = (
        list(right_payload)
        if right_payload is not None
        else [c for c in right.columns if c not in on and c != right_ts]
    )
    out_payload = [f"{c}{suffix}" if c in left.columns else c for c in payload]
    payload_schema = right.select(*payload).schema
    # tagged union: right rows sort BEFORE left rows at the same ts so
    # exact matches are visible to them (allow_exact_matches=True).
    # The payload is carried as ONE struct — a right row whose payload
    # members are NULL still counts as the match (per-column carries
    # would incorrectly reach further back for the null members).
    r = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c) for c in payload]).alias("__p"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in left.columns],
    )
    l = left.select(  # noqa: E741
        *[F.col(c) for c in on],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(payload_schema).alias("__p"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )
    w = (
        Window.partitionBy(*on)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = r.unionByName(l).withColumn("__match", F.last("__p", ignorenulls=True).over(w))
    if tolerance is not None:
        # the matched right row's own ts rides along to test staleness
        carried = carried.withColumn(
            "__match_ts", F.last(F.when(F.col("__side") == 0, F.col("__ts")), ignorenulls=True).over(w)
        ).withColumn(
            "__match",
            F.when(F.col("__match_ts") >= F.col("__ts") - tolerance, F.col("__match")),
        )
    return carried.where(F.col("__side") == 1).select(
        *[F.col(f"__l_{c}").alias(c) for c in left.columns],
        *[F.col("__match").getField(c).alias(out_c) for c, out_c in zip(payload, out_payload)],
    )


def resample_ffill(
    df,
    key_col: str,
    ts_col: str,
    value_cols,
    step: str = "15 minutes",
    start=None,
    end=None,
):
    """Per-key time-grid resampling with forward fill → one row per
    (key, grid_ts) carrying the latest observation at-or-before the
    grid point — the gap-filling step before joining irregular series
    (sensor feeds, balances) against regular ones.

    Plan shape: the observation rows and the exploded grid rows union
    (grid rows carry NULL values), then ONE window pass per key ordered
    by (ts, is_grid) takes last(value, ignorenulls) — no per-grid-point
    join, no driver loop. Grid bounds default to each key's own
    [min(ts), max(ts)] (computed in the same pass via a window) or the
    explicit `start`/`end` literals. Rows before a key's first
    observation stay NULL (nothing to fill from). The window partitions
    by key — skewed keys are bounded by their own series length, and the
    grid adds ceil(span/step) rows per key.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    value_cols = list(value_cols)
    obs = df.select(key_col, ts_col, *value_cols)
    if start is not None and end is not None:
        bounds = obs.select(key_col).distinct().select(
            F.col(key_col),
            F.lit(start).cast("timestamp").alias("__lo"),
            F.lit(end).cast("timestamp").alias("__hi"),
        )
    else:
        bounds = obs.groupBy(key_col).agg(
            F.min(ts_col).alias("__lo"), F.max(ts_col).alias("__hi")
        )
    grid = bounds.select(
        key_col,
        F.explode(
            F.sequence("__lo", "__hi", F.expr(f"INTERVAL {step}"))
        ).alias(ts_col),
    ).select(
        key_col,
        ts_col,
        *[F.lit(None).cast(dict(obs.dtypes)[c]).alias(c) for c in value_cols],
        F.lit(1).alias("__is_grid"),
    )
    unioned = obs.select("*", F.lit(0).alias("__is_grid")).unionByName(grid)
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col), F.col("__is_grid"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        key_col,
        ts_col,
        F.col("__is_grid"),
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in value_cols],
    )
    return filled.where(F.col("__is_grid") == 1).drop("__is_grid")


def interpolate_linear(
    df,
    key_col: str,
    ts_col: str,
    value_col: str,
    step: str = "15 minutes",
    start=None,
    end=None,
    out_col: str = "value_interp",
):
    """Per-key time-grid LINEAR interpolation — resample_ffill's sibling
    for continuous quantities (sensor readings, rates) where carrying
    the last observation misstates the trend.

    Same union shape as resample_ffill (no per-grid-point join), but
    ONE full-size window pass, not two (round-10, the q134 sf1 ask):
    each observation first learns its successor via lead() over the
    OBS-ONLY frame (the small side — observations, not observations +
    grid), then a single preceding-frame pass over the union recovers
    both surrounding observations for every grid row: pv/pt as before,
    and (nv, nt) as the successor STRUCT carried by the last preceding
    observation (a struct, so a final observation's null successor is
    not skipped by ignorenulls — no extrapolation, exactly as before).
    The unboundedFollowing pass this replaces ran over obs+grid and
    measured ~35% of the query's sf1 wall. Values are IDENTICAL: for a
    grid row between observations i and i+1, last-preceding-obs = i
    and i's successor = i+1 = first-following-obs; coincident grid rows
    take the pv branch before nv is consulted; grid rows before the
    first observation have pv NULL either way. The interp formula is
    the SAME IEEE expression tree an independent engine writes, so
    results are bit-identical (each double op is correctly rounded).
    Grid points outside a key's observed span stay NULL — interpolation
    never extrapolates; grid points ON an observation return it exactly
    (the numerator is zero). Bounds default per key to [min ts, max ts]
    or the explicit `start`/`end` literals.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    obs = df.select(
        key_col,
        F.col(ts_col).alias("__ts"),
        F.col(value_col).cast("double").alias("__v"),
        F.lit(0).alias("__is_grid"),
    )
    # bounds come from EVERY observation row (a null-valued endpoint
    # still anchors the grid span, as before), but the lead()/union
    # below must see only non-null-valued observations: lead() carries
    # the next ROW, and a null-valued successor row would make grid
    # points before it interpolate to NULL where the previous
    # first(ignorenulls) pass skipped it (round-10 ADVICE).
    bounds_src = obs
    obs = obs.where(F.col("__v").isNotNull())
    if start is not None and end is not None:
        bounds = bounds_src.select(key_col).distinct().select(
            F.col(key_col),
            F.lit(start).cast("timestamp").alias("__lo"),
            F.lit(end).cast("timestamp").alias("__hi"),
        )
    else:
        bounds = bounds_src.groupBy(key_col).agg(
            F.min("__ts").alias("__lo"), F.max("__ts").alias("__hi")
        )
    wobs = Window.partitionBy(key_col).orderBy("__ts")
    obs = obs.withColumn(
        "__nxt",
        F.struct(
            F.lead("__v").over(wobs).alias("nv"),
            F.lead("__ts").over(wobs).alias("nt"),
        ),
    )
    grid = bounds.select(
        key_col,
        F.explode(F.sequence("__lo", "__hi", F.expr(f"INTERVAL {step}"))).alias("__ts"),
    ).select(
        key_col, "__ts", F.lit(None).cast("double").alias("__v"), F.lit(1).alias("__is_grid")
    ).withColumn("__nxt", F.lit(None).cast(obs.schema["__nxt"].dataType))
    rows = obs.unionByName(grid)
    w = Window.partitionBy(key_col).orderBy("__ts", "__is_grid")
    prev_frame = w.rowsBetween(Window.unboundedPreceding, 0)
    ts_of_obs = F.when(F.col("__v").isNotNull(), F.col("__ts"))
    pv = F.last("__v", ignorenulls=True).over(prev_frame)
    pt = F.last(ts_of_obs, ignorenulls=True).over(prev_frame)
    # the last preceding observation's successor struct — __nxt is NULL
    # on grid rows (skipped by ignorenulls) and a NON-null struct on
    # every observation row (possibly with null fields, so a final
    # observation still yields nv = NULL → no extrapolation)
    nxt = F.last("__nxt", ignorenulls=True).over(prev_frame)
    nv = nxt["nv"]
    nt = nxt["nt"]
    # exact integer MICROSECONDS (sub-second observations truncate
    # differently across engines at second granularity), differenced
    # exactly in int64 before the one double division
    t_s = F.unix_micros(F.col("__ts")).cast("double")
    pt_s = F.unix_micros(pt).cast("double")
    nt_s = F.unix_micros(nt).cast("double")
    interp = (
        # a grid point coincident with an observation IS that observation
        # (covers the last-observation edge, where no `next` exists)
        F.when(pv.isNotNull() & (pt_s == t_s), pv)
        .when(pv.isNull() | nv.isNull(), F.lit(None).cast("double"))
        .otherwise(pv + (nv - pv) * (t_s - pt_s) / (nt_s - pt_s))
    )
    return (
        rows.withColumn(out_col, interp)
        .where(F.col("__is_grid") == 1)
        .select(key_col, F.col("__ts").alias(ts_col), out_col)
    )


def time_weighted_mean(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_cents_col: str,
) -> DataFrame:
    """Time-weighted average over an IRREGULARLY-sampled step series per
    key → (key…, n_obs, dur_us, twap_cents): each observation holds
    until the next one (step/last-observation-carried-forward), so its
    weight is the microseconds until the successor; the final
    observation closes the series and carries no weight. The arithmetic
    -mean of irregular samples is simply wrong for sensor/price/state
    series — a value that held for an hour must outweigh one that held
    a second — and TWAP = Σ v_i·(t_{i+1}−t_i) div (t_n−t_1) in exact
    int64 microseconds is the standard fix (and engine-bit-identical,
    unlike a float accumulation).

    One window pass per key (lead over the time order) + one
    aggregation; keys with a single observation have zero duration and
    are emitted with twap_cents = NULL (no interval to average over).
    """
    keys = list(key_cols)
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col))
    us = F.unix_micros(F.col(ts_col))
    stepped = df.withColumn("__t", us).withColumn(
        "__nt", F.lead(us.cast("bigint")).over(w.orderBy(F.col(ts_col)))
    )
    return (
        stepped.groupBy(*keys)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_obs"),
            (F.max("__t") - F.min("__t")).cast("bigint").alias("dur_us"),
            F.sum(
                F.when(
                    F.col("__nt").isNotNull(),
                    F.col(value_cents_col) * (F.col("__nt") - F.col("__t")),
                )
            ).cast("bigint").alias("__wsum"),
        )
        .withColumn(
            "twap_cents",
            F.when(
                F.col("dur_us") > 0, F.expr("__wsum div dur_us")
            ).cast("bigint"),
        )
        .drop("__wsum")
    )
