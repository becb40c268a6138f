"""Text-file readers: CSV (plain/quoted/regex-sep), fixed-width, skip
rules, and the read-time transform pipeline (trim → normalize → rename
→ hooks) — SURVEY §2.1 S1-S6, §2.3 P1-P6.

Re-expresses the semantics of the reference's readText
(reference Wrap/File.pm:12-140) Spark-first:

- Plain/quoted CSV goes straight to Spark's csv source (distributed
  scan, pushdown-friendly).
- Regex separators, skip-until-pattern, stop-on-empty-column, and
  previous-row context need line identity; they read through the
  `text` source with a per-file line number (window over
  monotonically_increasing_id, which the text source emits in file
  order per partition).

Scale note: the line-number window for skip/stop semantics partitions
by file — many medium files parallelize perfectly; one giant file with
skip-until-pattern serializes its window (unavoidable for order-defined
semantics — the idiom at scale is header metadata, not in-band
markers). Plain CSV paths never pay this cost.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_wrap_spark.functions.coerce import normalize_numerics


def read_csv(
    spark: SparkSession,
    paths: str | Sequence[str],
    header: Sequence[str] | None = None,
    sep: str = "\t",
    quoted: bool = False,
    encoding: str = "UTF-8",
    skip: int = 0,
    eol: str | None = None,
    allow_linefeed_in_data: bool = False,
    has_header_row: bool = False,
) -> DataFrame:
    """S1/S2: separated text → DataFrame of strings.

    `header` declares column names (format_header); with
    `has_header_row` the first line is consumed (and when `header` is
    also given, validated — the reference's header assertion S10).
    """
    if skip:
        # Spark's csv source derives the column count from the first line,
        # so leading junk lines must be dropped before parsing: go through
        # the text source with per-file line numbers.
        import re as _re

        if quoted:
            # line-based skipping is ill-defined when quoted values may
            # contain the record separator — the reference has the same
            # constraint (Text::CSV consumes whole records)
            raise ValueError(
                "skip is not supported together with quoted csv; strip the "
                "junk lines upstream or use skip_lines on read_lines"
            )
        if header is None:
            raise ValueError("skip with unquoted csv requires a declared header")
        lines = drop_empty_lines(skip_lines(read_lines(spark, paths, eol), skip))
        df = split_columns(lines, header, _re.escape(sep)).drop("_file", "_line_no")
        return df
    reader = (
        spark.read.option("sep", sep)
        .option("encoding", encoding)
        .option("inferSchema", "false")
        .option("mode", "PERMISSIVE")
    )
    if quoted:
        reader = reader.option("quote", '"').option("escape", '"')
        if allow_linefeed_in_data:
            reader = reader.option("multiLine", "true")
    else:
        reader = reader.option("quote", "")
    if eol:
        reader = reader.option("lineSep", eol)
    reader = reader.option("header", "true" if has_header_row else "false")
    df = reader.csv(list(paths) if not isinstance(paths, str) else paths)
    if header:
        if has_header_row:
            actual = df.columns
            if list(actual) != list(header):
                raise ValueError(f"header mismatch: file has {actual}, expected {list(header)}")
        else:
            if len(df.columns) != len(header):
                raise ValueError(f"column count mismatch: file has {len(df.columns)}, expected {len(header)}")
            df = df.toDF(*header)
    return df


_SINGLE_FILE_WINDOW_WARN_BYTES = 256 * 1024 * 1024


def read_lines(spark: SparkSession, paths: str | Sequence[str], eol: str | None = None) -> DataFrame:
    """Raw lines with per-file order identity: (_file, _line_no, value).

    The building block for regex-sep / fixed-width / skip-pattern /
    stop-on-empty semantics.

    Scale note: line numbering windows over ``partitionBy(_file)``, so
    ONE giant file serializes into one window partition — unavoidable
    for order-defined semantics (skip-N, stop-on-pattern are defined by
    file position). This warns when any single input file exceeds
    256 MB: split such inputs upstream, or use plain ``spark.read`` when
    order semantics aren't needed."""
    reader = spark.read
    if eol:
        reader = reader.option("lineSep", eol)
    path_list = list(paths) if not isinstance(paths, str) else [paths]
    try:
        import glob as _glob
        import os as _os
        import warnings as _warnings

        for p in path_list:
            for m in _glob.glob(p) or [p]:
                if _os.path.isfile(m) and _os.path.getsize(m) > _SINGLE_FILE_WINDOW_WARN_BYTES:
                    _warnings.warn(
                        f"read_lines: {m} is "
                        f"{_os.path.getsize(m) >> 20} MB; per-file line numbering "
                        "processes each file in a single window partition — "
                        "split large files upstream for parallelism",
                        stacklevel=2,
                    )
    except OSError:
        pass  # non-local paths (hdfs/s3): the warning is best-effort only
    df = reader.text(path_list if len(path_list) > 1 else path_list[0])
    df = df.select(
        F.input_file_name().alias("_file"),
        F.monotonically_increasing_id().alias("_mid"),
        "value",
    )
    w = Window.partitionBy("_file").orderBy("_mid")
    return df.select("_file", (F.row_number().over(w) - 1).alias("_line_no"), "value")


def skip_lines(lines: DataFrame, skip: int | str) -> DataFrame:
    """S4: drop the first N lines per file, or — given a regex string —
    every line up to and including the first match."""
    if isinstance(skip, int):
        return lines.where(F.col("_line_no") >= skip)
    w = Window.partitionBy("_file")
    first_match = F.min(F.when(F.col("value").rlike(skip), F.col("_line_no"))).over(w)
    return lines.withColumn("_skip_at", first_match).where(
        F.col("_skip_at").isNotNull() & (F.col("_line_no") > F.col("_skip_at"))
    ).drop("_skip_at")


def drop_empty_lines(lines: DataFrame) -> DataFrame:
    """S6: drop entirely empty lines."""
    return lines.where(F.col("value") != "")


def split_columns(lines: DataFrame, header: Sequence[str], sep_regex: str) -> DataFrame:
    """S1 (regex-sep variant): split `value` by a regex separator into the
    declared columns; missing trailing fields become NULL."""
    parts = F.split(F.col("value"), sep_regex)
    cols = [parts.getItem(i).alias(h) for i, h in enumerate(header)]
    return lines.select("_file", "_line_no", *cols)


def slice_fixed_width(
    lines: DataFrame, poslen: Sequence[tuple[int, int]], header: Sequence[str]
) -> DataFrame:
    """S3: fixed-width slicing by [start, start+len) byte positions
    (reference format_poslen, Wrap/File.pm:28-32)."""
    cols = [
        F.substring(F.col("value"), start + 1, length).alias(h)
        for (start, length), h in zip(poslen, header)
    ]
    return lines.select("_file", "_line_no", *cols)


def stop_on_empty_value(df: DataFrame, col: str) -> DataFrame:
    """S12: truncate each file at the first row whose `col` is empty/null
    (rows strictly before it survive)."""
    w = Window.partitionBy("_file")
    is_empty = F.col(col).isNull() | (F.col(col) == "")
    stop_at = F.min(F.when(is_empty, F.col("_line_no"))).over(w)
    return df.withColumn("_stop_at", stop_at).where(
        F.col("_stop_at").isNull() | (F.col("_line_no") < F.col("_stop_at"))
    ).drop("_stop_at")


def drop_empty_first_field(df: DataFrame, first_col: str) -> DataFrame:
    """S6 second half: drop rows whose first column is empty."""
    return df.where(F.col(first_col).isNotNull() & (F.col(first_col) != ""))


def first_line(spark: SparkSession, path: str) -> str | None:
    """S5 firstLineProc support: the file's first line, driver-side, for a
    user callback (e.g. extracting a report date). The result is
    typically re-entered into the plan as a literal column."""
    row = spark.read.text(path).limit(1).collect()
    return row[0]["value"] if row else None


# --------------------------------------------------- read-time transform P1-P6
def apply_read_pipeline(
    df: DataFrame,
    header: Sequence[str],
    targetheader: Sequence[str] | None = None,
    trim: bool = True,
    normalize: bool = False,
    thousandsep: str = ",",
    decimalsep: str = ".",
    field_hooks: dict[str, Callable[[Column], Column]] | None = None,
    keep_line_no: bool = False,
) -> DataFrame:
    """The reference's per-line shaping (Wrap/File.pm:445-489) as one
    projection: trim (P1) → numeric normalization (P2) → per-field hook
    columns (P4, Column-level callables instead of eval strings) →
    rename header→targetheader with non-target columns dropped (P3).
    """
    cols: list[Column] = []
    target = list(targetheader) if targetheader else list(header)
    for src, dst in zip(header, target):
        if not dst:  # empty target name → column dropped (reference semantics)
            continue
        c = F.col(src)
        if trim:
            c = F.trim(c)
        if normalize:
            c = normalize_numerics(c, thousandsep, decimalsep)
        if field_hooks and src in field_hooks:
            c = field_hooks[src](c)
        cols.append(c.alias(dst))
    if keep_line_no and "_line_no" in df.columns:
        cols = [F.col("_line_no"), *cols]
    return df.select(*cols)


def with_prev_row(df: DataFrame, cols: Sequence[str], partition_by: str = "_file") -> DataFrame:
    """P5 previous-row context (reference %previousline): adds
    prev_<col> columns via lag over the file order. Requires _line_no
    (read through read_lines)."""
    w = Window.partitionBy(partition_by).orderBy("_line_no")
    out = df
    for c in cols:
        out = out.withColumn(f"prev_{c}", F.lag(c).over(w))
    return out


def row_hook(df: DataFrame, fn, schema) -> DataFrame:
    """P5 arbitrary per-row hook: `fn(pandas.DataFrame) ->
    pandas.DataFrame` applied per partition via mapInPandas (Arrow
    batches). Row suppression (P6) = returning fewer rows."""

    def runner(batches):
        for pdf in batches:
            yield fn(pdf)

    return df.mapInPandas(runner, schema=schema)
