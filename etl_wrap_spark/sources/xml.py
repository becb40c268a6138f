"""XML source (SURVEY §2.1 S13): record extraction with per-field
XPaths, namespaces, and document-level (absolute) fields — the
semantics of the reference's readXML (Wrap/File.pm:351-424).

Two paths:
- `read_xml`: Spark's built-in xml source (`rowTag`) — distributed,
  schema-inferred; the right default when records are uniform elements.
- `read_xml_xpath`: the reference's model — a record-level XPath plus a
  per-field XPath map, where absolute paths (leading '/') escape to the
  document root and become constant columns (Wrap/File.pm:389-416).
  Implemented with `wholetext` + Spark's xpath expression family:
  per-record fields are extracted as aligned arrays and zipped/exploded
  positionally, document-level fields with xpath_string. Files
  parallelize by count (one doc per row); a single giant document
  doesn't split — same as every XML engine.
"""

from __future__ import annotations

import re
from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_xml(
    spark: SparkSession,
    paths: str | Sequence[str],
    row_tag: str,
    schema=None,
) -> DataFrame:
    reader = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(paths if isinstance(paths, str) else list(paths))


def _strip_namespaces(doc):
    """The reference registers namespaces explicitly; Spark's xpath exprs
    are namespace-blind, so the pragmatic equivalent (same trick used in
    production Spark pipelines) is stripping prefixes + xmlns decls."""
    doc = F.regexp_replace(doc, r"xmlns(:\w+)?\s*=\s*\"[^\"]*\"", "")
    doc = F.regexp_replace(doc, r"<(/?)\w+:", "<$1")
    return doc


def read_xml_xpath(
    spark: SparkSession,
    paths: str | Sequence[str],
    record_xpath: str,
    field_xpaths: Mapping[str, str],
    strip_namespaces: bool = False,
) -> DataFrame:
    """Record-level XPath + per-field relative/absolute XPath map.

    field path not starting with '/': relative to each record node;
    starting with '/': evaluated once per document (constant column).
    """
    df = spark.read.text(
        paths if isinstance(paths, str) else list(paths), wholetext=True
    ).select(F.input_file_name().alias("_file"), F.col("value").alias("_doc"))
    doc = _strip_namespaces(F.col("_doc")) if strip_namespaces else F.col("_doc")
    rel = {k: v for k, v in field_xpaths.items() if not v.startswith("/")}
    absolute = {k: v for k, v in field_xpaths.items() if v.startswith("/")}
    arr_cols = [
        F.xpath(doc, F.lit(f"{record_xpath}/{_textpath(p)}")).alias(name) for name, p in rel.items()
    ]
    const_cols = [F.xpath_string(doc, F.lit(p)).alias(name) for name, p in absolute.items()]
    names = list(rel)
    if not names:
        raise ValueError("at least one relative field xpath is required")
    zipped = df.select("_file", *const_cols, F.posexplode(F.arrays_zip(*arr_cols)).alias("_pos", "_rec"))
    return zipped.select(
        "_file",
        F.col("_pos").alias("_record_no"),
        *[F.col(f"_rec.{n}").alias(n) for n in names],
        *[F.col(n) for n in absolute],
    )


def _textpath(p: str) -> str:
    """Ensure the xpath yields text content (Spark's xpath() returns node
    string-values only for text()/attribute selections)."""
    if p.endswith(")") or p.endswith("]") and "text()" in p:
        return p
    if p.endswith("/text()") or re.search(r"@[\w-]+$", p):
        return p
    return p + "/text()"
