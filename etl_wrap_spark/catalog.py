"""Query catalog: every implemented operator exposed as a (spark, oracle) pair.

Each entry maps a name → a callable ``(spark, sf_dir) -> DataFrame`` plus an
equivalent ANSI-SQL string DuckDB can run over the same parquet tables.  This
is the engine's correctness surface (driver contract in ``__spark_entry__.py``).

Determinism rules used throughout (so value-hashes match the oracle):
- Aggregate in exact DECIMAL arithmetic (order-independent), never SUM doubles.
- Derive doubles only via deterministic casts/divisions of exact decimals.
- Alias every computed column identically on both sides.
- Pin session timezone UTC (session.py) so parquet timestamps agree.
- Surface DOUBLE (never DECIMAL) in final projections: the driver's typed
  hash fetches Spark decimals as Python ``Decimal`` objects but DuckDB
  decimals as float64 — equal values, unequal hashes (the round-1 19-query
  lesson). Spark's decimal→double cast is correctly rounded; DuckDB's
  direct decimal→double cast is NOT (measured: ~4% of values 1 ulp off
  above 2^53 unscaled), so oracles convert via
  ``CAST(CAST(x AS VARCHAR) AS DOUBLE)`` (strtod is correctly rounded) —
  both engines then emit identical IEEE bits.
- Wrap integer SUMs in ``CAST(... AS BIGINT)`` in oracle SQL: DuckDB's
  SUM(int) is HUGEINT and fetches as float64, Spark's is int64.
  (Integer *widths* need not match: int32 vs int64 hash alike.)
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_wrap_spark.session import load_tables

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLE: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLE[name] = oracle
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    # import for side effects: modules register their queries.
    # Registration ORDER is part of the driver contract: the driver
    # records the FIRST 50 registrations, so the first three modules
    # (whose combined first 50 registrations are 50 distinct operators)
    # must import before queries_tail and queries_extra, which hold the
    # redundant variants (q24/q34/q47) and all post-slot-50 additions.
    # The exact driver-visible set is pinned by
    # tests/test_catalog_contract.py — run it before reordering ANYTHING
    # here or adding a registration to the first three modules.
    import etl_wrap_spark.queries_core  # noqa: F401
    import etl_wrap_spark.queries_functions  # noqa: F401
    import etl_wrap_spark.queries_llm  # noqa: F401
    import etl_wrap_spark.queries_tail  # noqa: F401
    import etl_wrap_spark.queries_extra  # noqa: F401

    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    queries()
    return dict(_ORACLE)


def _dec(col, prec=18, scale=4):
    return F.col(col).cast(f"decimal({prec},{scale})")
