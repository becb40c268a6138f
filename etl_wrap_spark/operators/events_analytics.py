"""Event-sequence analytics: funnel progression and cohort retention.

The classic product-analytics pair over an event stream — both are
pure relational compositions (no UDFs), expressed so every shuffle
lands on the user key:

- funnel_stages: ordered-stage progression (stage k counts only when
  it happens strictly AFTER stage k-1). One type-filtered aggregation
  plus one user-key join per stage; the type filter pushes into the
  scan, and every join/agg shares the user-id partitioning, so AQE
  coalesces the cascade into co-partitioned exchanges at scale.
- cohort_retention: users bucketed by first-seen week; per
  (cohort_week, week_offset) distinct-active counts. Two aggregations
  and a user-key join.

No ETL-Wrap analogue (analytics addition beyond the reference's
operator set); both shapes stream with watermarks (the aggs are
per-user monotone minima).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_stages(
    events: DataFrame,
    stages: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user funnel: (user, t1..tN) where t_k is the earliest
    stage-k event strictly after t_{k-1} (NULL once progression stops).
    Returns every user who reached stage 1, ordered columns t1..tN."""
    if not stages:
        raise ValueError("stages must be non-empty")
    cur = (
        events.where(F.col(type_col) == stages[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t1"))
    )
    for i, st in enumerate(stages[1:], start=2):
        prev = f"t{i - 1}"
        reached = cur.where(F.col(prev).isNotNull()).select(user_col, prev)
        nxt = (
            events.where(F.col(type_col) == st)
            .join(reached, user_col)
            .where(F.col(ts_col) > F.col(prev))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias(f"t{i}"))
        )
        cur = cur.join(nxt, user_col, "left")
    return cur


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(cohort_week, week_offset, n_users): distinct users from the
    cohort (first-seen week) active in cohort_week + 7*offset days."""
    first = events.groupBy(user_col).agg(
        F.date_trunc("week", F.min(ts_col)).alias("cohort_week")
    )
    active = events.select(
        F.col(user_col), F.date_trunc("week", F.col(ts_col)).alias("active_week")
    ).distinct()
    return (
        active.join(first, user_col)
        .select(
            "cohort_week",
            (F.datediff("active_week", "cohort_week") / 7).cast("int").alias("week_offset"),
            F.col(user_col),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct(user_col).alias("n_users"))
    )
