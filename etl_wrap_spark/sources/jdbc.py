"""JDBC connector layer (SURVEY §2.1 S14-S16, §2.2 K1-K12 DB side).

The reference's DB surface (reference Wrap/DB.pm) is pass-through SQL
reads (readFromDB :71-99), keyed lookup reads (readFromDBHash :102-130),
row-wise typed writes with upsert/delete/update variants (:166-508), and
arbitrary statements incl. multi-result-sets (doInDB :133-163).

Spark-first mapping:
- Reads push the WHOLE query down (`spark.read.jdbc` subquery) and
  parallelize with partitionColumn bounds — the 100-TB ingestion path.
- Writes are batched `df.write.jdbc` (vs the reference's one INSERT per
  row) — executors write partitions concurrently.
- Upsert/delete against an RDBMS = stage + one server-side MERGE/DELETE
  (set-based, transactional), replacing row-at-a-time retry loops.
  The equivalent pure-DataFrame algebra for lake targets lives in
  sinks/merge.py.
- Multi-result-set statements have no Spark primitive (SURVEY §2.1 S16):
  `execute` runs them driver-side over the SAME JVM's DriverManager
  (py4j), returning every result set.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def read_query(
    spark: SparkSession,
    url: str,
    query: str,
    driver: str | None = None,
    fetchsize: int = 10_000,
    partition_column: str | None = None,
    lower_bound=None,
    upper_bound=None,
    num_partitions: int | None = None,
) -> DataFrame:
    """S14 readFromDB: arbitrary SQL pushed down as a subquery scan.

    With partition bounds the read fans out to `num_partitions` parallel
    range queries — required for any large table (a single JDBC cursor
    does not scale)."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", f"({query}) q")
        .option("fetchsize", fetchsize)
    )
    if driver:
        reader = reader.option("driver", driver)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", lower_bound)
            .option("upperBound", upper_bound)
            .option("numPartitions", num_partitions or 8)
        )
    return reader.load()


def read_keyed_lookup(spark: SparkSession, url: str, query: str, keyfield: str, **kw) -> DataFrame:
    """S15 readFromDBHash: keyed lookup — deduplicated on the key like
    fetchall_hashref (which-row-wins is undefined in the reference; we
    keep the row that sorts first over all payload columns, so repeated
    runs return identical lookups — plain dropDuplicates keeps a
    partition-order-dependent row). Intended to be broadcast-joined (J1)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = read_query(spark, url, query, **kw)
    payload = [c for c in df.columns if c != keyfield]
    if not payload:
        return df.dropDuplicates([keyfield])
    w = Window.partitionBy(keyfield).orderBy(*[F.col(c).asc_nulls_last() for c in payload])
    return df.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1).drop("__rn")


def write_table(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    driver: str | None = None,
    batchsize: int = 10_000,
    truncate: bool = False,
) -> None:
    """K1/K5: batched distributed insert; overwrite+truncate is the
    full-refresh load (`delete from` + insert, Wrap.pm:353-356)."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", batchsize)
        .option("truncate", str(truncate).lower())
        .mode(mode)
    )
    if driver:
        writer = writer.option("driver", driver)
    writer.save()


def execute(spark: SparkSession, url: str, sql: str) -> list[list[tuple]]:
    """S16 doInDB: run any statement driver-side; returns ALL result sets
    (odbc_more_results parity). DDL/DML return no result sets."""
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    results: list[list[tuple]] = []
    try:
        stmt = conn.createStatement()
        has_rs = stmt.execute(sql)
        while True:
            if has_rs:
                rs = stmt.getResultSet()
                md = rs.getMetaData()
                ncols = md.getColumnCount()
                rows = []
                while rs.next():
                    rows.append(tuple(rs.getObject(i + 1) for i in range(ncols)))
                results.append(rows)
            elif stmt.getUpdateCount() == -1:
                break
            has_rs = stmt.getMoreResults()
        return results
    finally:
        conn.close()


def _merge_sql(table: str, staging: str, keys: Sequence[str], columns: Sequence[str],
               update_cols: Sequence[str] | None = None, delete_matched: bool = False) -> str:
    on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
    if delete_matched:
        return f"MERGE INTO {table} t USING {staging} s ON ({on}) WHEN MATCHED THEN DELETE"
    upd = update_cols if update_cols is not None else [c for c in columns if c not in keys]
    set_clause = ", ".join(f"t.{c} = s.{c}" for c in upd)
    cols = ", ".join(columns)
    vals = ", ".join(f"s.{c}" for c in columns)
    matched = f"WHEN MATCHED THEN UPDATE SET {set_clause} " if upd else ""
    return (
        f"MERGE INTO {table} t USING {staging} s ON ({on}) "
        f"{matched}"
        f"WHEN NOT MATCHED THEN INSERT ({cols}) VALUES ({vals})"
    )


def staged_upsert(
    df: DataFrame,
    url: str,
    table: str,
    keys: Sequence[str],
    staging_table: str | None = None,
    driver: str | None = None,
) -> None:
    """K2/K3 upsert against an RDBMS: distributed write to a staging
    table, then ONE server-side MERGE (covers both of the reference's
    statement orders, Wrap/DB.pm:355-401). The merge is transactional on
    the server — the engine's txn-bracket equivalent (K12)."""
    spark = df.sparkSession
    staging = staging_table or f"{table}_stage"
    execute(spark, url, f"DELETE FROM {staging}")
    write_table(df, url, staging, mode="append", driver=driver)
    execute(spark, url, _merge_sql(table, staging, keys, df.columns))


def staged_delete(
    df_keys: DataFrame, url: str, table: str, keys: Sequence[str],
    staging_table: str | None = None, driver: str | None = None,
) -> None:
    """K10 deleteFromDB: stage the key set, server-side MERGE-delete."""
    spark = df_keys.sparkSession
    staging = staging_table or f"{table}_delstage"
    execute(spark, url, f"DELETE FROM {staging}")
    write_table(df_keys.select(*keys).dropDuplicates(), url, staging, mode="append", driver=driver)
    execute(spark, url, _merge_sql(table, staging, keys, list(keys), delete_matched=True))
