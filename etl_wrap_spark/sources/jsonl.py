"""JSON-lines source/sink — the interchange format of training-data
pipelines (one document object per line, directory-of-files layout,
transparent .gz).

Spark's native json reader is the scan: schema-enforced, predicate
pushdown on top-level fields, splittable per file. The wrapper adds the
corrupt-line quarantine posture of the engine's other sources
(functions/coerce.py:quarantine_split): a malformed line never aborts a
100 TB load — it lands in a quarantine frame with the raw text
preserved for replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructType


CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
    multiline: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Schema-enforced JSONL read → (good, quarantined).

    PERMISSIVE mode with an explicit corrupt-record column: parseable
    lines land typed in `good`; malformed lines arrive as their raw
    text in `quarantined` (single `raw` string column). The frame is
    persisted before the split — Spark disallows filtering on the
    internal corrupt column of an unmaterialized scan, and the two
    output frames would otherwise each re-read the input.
    """
    full = schema.add(CORRUPT_COL, StringType())
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("multiLine", multiline)
        .json(path)
        .persist()
    )
    good = df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.where(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw")
    )
    return good, bad


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite", compression: str | None = None) -> None:
    """Directory-of-jsonl write (one part file per partition; pass
    compression='gzip' for .jsonl.gz shards)."""
    w = df.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.json(path)
