"""SQL pass-through surface (SURVEY §2.5 J2): the reference's
postDumpExecs — a conditional batch of SQL statements after a load
(reference Wrap.pm:372-398) — against Spark SQL over registered views.

Conditions are Python callables (not eval strings — SURVEY §7.4), and
statement parameters are interpolated via named placeholders with SQL
literal escaping.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession


def sql_literal(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    return "'" + str(v).replace("'", "''") + "'"


def render(stmt: str, params: Mapping[str, object] | None) -> str:
    """Fill `:name` placeholders with escaped literals (the Spark-era
    form of the reference's $-interpolated exec strings)."""
    if not params:
        return stmt
    out = stmt
    for k in sorted(params, key=len, reverse=True):
        out = out.replace(f":{k}", sql_literal(params[k]))
    return out


def run_sql_execs(
    spark: SparkSession,
    execs: Sequence[str],
    condition: Callable[[], bool] | None = None,
    params: Mapping[str, object] | None = None,
) -> list[DataFrame]:
    """Run the statement batch when `condition()` holds (or always);
    returns the result DataFrames (lazy — callers act on them)."""
    if condition is not None and not condition():
        return []
    return [spark.sql(render(s, params)) for s in execs]
