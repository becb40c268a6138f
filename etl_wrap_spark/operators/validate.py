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
