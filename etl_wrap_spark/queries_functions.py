"""Queries exercising the scalar function library (SURVEY §2.8) and the
type-coercion pipelines (§2.3) against the driver's parquet tables.

Populated alongside etl_wrap_spark.functions.*.
"""

from __future__ import annotations
