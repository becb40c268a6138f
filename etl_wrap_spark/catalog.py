"""Query catalog: every implemented operator exposed as a (spark, oracle) pair.

Each entry maps a name → a callable ``(spark, sf_dir) -> DataFrame`` plus an
equivalent ANSI-SQL string DuckDB can run over the same parquet tables.  This
is the engine's correctness surface (driver contract in ``__spark_entry__.py``).

Determinism rules used throughout (so value-hashes match the oracle):
- Aggregate in exact DECIMAL arithmetic (order-independent), never SUM doubles.
- Derive doubles only via deterministic casts/divisions of exact decimals.
- Alias every computed column identically on both sides.
- Pin session timezone UTC (session.py) so parquet timestamps agree.
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
    # import for side effects: modules register their queries
    import etl_wrap_spark.queries_core  # noqa: F401
    import etl_wrap_spark.queries_functions  # noqa: F401
    import etl_wrap_spark.queries_llm  # noqa: F401

    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    queries()
    return dict(_ORACLE)


def _dec(col, prec=18, scale=4):
    return F.col(col).cast(f"decimal({prec},{scale})")
