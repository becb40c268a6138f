"""Lake-format sinks: partitioned parquet and bucketed tables — the
100-TB landing path (SURVEY §7.1 M5 scale stance).

Partitioning drives partition PRUNING on read (a filter on the
partition column skips whole directories); bucketing drives co-located,
shuffle-free joins between tables bucketed on the same keys.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str],
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    """Hive-style partitioned parquet. `max_records_per_file` bounds
    output file size (small-file storms are the classic failure here —
    callers should derive partition columns with bounded cardinality,
    e.g. dates, not raw keys)."""
    writer = df.write.mode(mode)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.partitionBy(*partition_by).parquet(path)


def overwrite_partitions(df: DataFrame, path: str, partition_by: Sequence[str]) -> None:
    """Dynamic partition overwrite: only partitions present in `df` are
    replaced — the idiomatic delete-before-insert (reference K4,
    Wrap/DB.pm:337-347) for lake targets."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(*partition_by).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_by: Sequence[str],
    num_buckets: int,
    sort_by: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: joins/aggregations between tables bucketed
    on the same keys and bucket count skip the shuffle entirely."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.format("parquet").saveAsTable(table)


def read_pruned(spark: SparkSession, path: str) -> DataFrame:
    """Plain read of a partitioned dataset; filters on partition columns
    prune directories (verify via explain: PartitionFilters)."""
    return spark.read.parquet(path)
