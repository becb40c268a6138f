"""Multimodal column plumbing (SURVEY §7.1 M9): image/audio/video as
opaque `binary` columns with typed metadata, processed by Arrow-batched
Pandas UDFs over `mapInPandas`.

The decode step itself is STUBBED (`decode_image` raises unless a
deterministic fake is requested — the real image/audio libraries are
not in this environment); everything Spark-side is real and tested:
schemas, batch iteration, partition behavior, and the UDF signatures a
production decoder would drop into.

Scale notes: binary payloads ride in Arrow record batches (zero-copy to
pandas); `spark.sql.execution.arrow.maxRecordsPerBatch` bounds batch
memory for large blobs; decode parallelism == partition count, so
`repartition(n)` before `with_decoded_features` is the throughput knob.
A real deployment reads blobs via the `binaryFile` source (path, length,
modificationTime, content) partitioned by directory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("content", BinaryType()),
        StructField("content_length", LongType()),
        StructField("sha256", StringType()),
    ]
)

FEATURE_SCHEMA = StructType(
    MEDIA_SCHEMA.fields[:2]
    + [
        StructField("content_length", LongType()),
        StructField("sha256", StringType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)

FEATURE_DIM = 16


def decode_image(content: bytes, fake: bool = False) -> list[float]:
    """Decode one image blob to a feature vector.

    STUB: the container has no imaging libraries. With `fake=True` a
    deterministic digest-derived vector is produced (stable across
    engines/runs) so the distributed plumbing is testable end-to-end;
    a real deployment replaces this body with PIL/torchvision code of
    the same signature.
    """
    if not fake:
        raise NotImplementedError(
            "image decoding requires an imaging library not present in this "
            "environment; pass fake=True for the deterministic test stub"
        )
    digest = hashlib.sha256(content).digest()
    return [round(b / 255.0, 6) for b in digest[:FEATURE_DIM]]


def media_frame_from_binary(df: DataFrame, id_col: str, content_col: str, kind: str) -> DataFrame:
    """Normalize an arbitrary (id, binary) frame into the MEDIA_SCHEMA
    shape — metadata derived in-plan (no Python)."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.col(content_col).cast("binary").alias("content"),
        F.octet_length(F.col(content_col).cast("binary")).cast("long").alias("content_length"),
        F.sha2(F.col(content_col).cast("binary"), 256).alias("sha256"),
    )


def with_decoded_features(media: DataFrame, fake: bool = False) -> DataFrame:
    """Attach decoded feature vectors via mapInPandas (Arrow batches).

    The UDF is a generator over pandas batches — constant memory per
    task regardless of partition size.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["feature"] = [decode_image(bytes(c), fake=fake) for c in pdf["content"]]
            yield pdf.drop(columns=["content"])

    return media.mapInPandas(decode_batches, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_nth: int = 10) -> DataFrame:
    """Video frame-sampling *plan* shape: one output row per sampled frame
    index. Frame extraction itself is part of the stubbed decode; the
    explode/posexplode structure (1 blob → N frame rows) is the real
    Spark-side contract."""
    n_frames = (F.col("content_length") / 1000).cast("int") + 1  # stub: ~1 frame/KB
    idx = F.sequence(F.lit(0), n_frames - 1, F.lit(every_nth))
    return media.select(
        "media_id", "kind", "sha256", F.explode(idx).alias("frame_index")
    )
