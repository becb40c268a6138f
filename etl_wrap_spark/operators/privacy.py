"""Privacy operators for shared/training datasets — deterministic
pseudonymization and k-anonymity suppression.

operators/text.py:redact_pii scrubs identifiers out of free text; this
module handles the STRUCTURED side of the same release process:

- ``pseudonymize``: replace identifier columns with a salted-hash token
  (sha256(salt || ':' || value)). Deterministic per salt, so joins and
  group-bys still line up across tables pseudonymized with the same
  salt — linkability WITHIN the release, no reversibility without the
  salt. Rotating the salt between releases breaks cross-release
  linkage ("crypto-shredding": destroy the salt and every token becomes
  an opaque random string). Map-only (JVM sha2, no UDF).
- ``k_suppress``: the k-anonymity gate — rows whose quasi-identifier
  combination occurs fewer than k times are dropped (or kept with the
  quasi-identifiers nulled via ``mode="null"``), so no released row is
  identifiable within a group smaller than k. One count aggregation on
  the quasi-key reused by the filter join; at 100 TB this is the same
  hot-key-safe shape as the df-cap indexes (a window count over the
  quasi-key partition).

No reference analogue (Wrap.pm ships raw extracts); standard release
hygiene for corpora. Oracle-checked as q105: DuckDB computes the same
sha256 tokens and group-size gate bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pseudonym(col, salt: str):
    """Salted deterministic token for one column (lowercase sha256 hex —
    identical in DuckDB's ``sha256()``); NULL stays NULL (a missing
    identifier must not collapse to the hash-of-salt token)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(
        c.isNotNull(),
        F.sha2(F.concat(F.lit(salt), F.lit(":"), c.cast("string")), 256),
    )


def pseudonymize(df: DataFrame, cols: Sequence[str], salt: str) -> DataFrame:
    """Replace each identifier column with its salted token, in place
    (same column names, string type)."""
    out = df
    for c in cols:
        out = out.withColumn(c, pseudonym(c, salt))
    return out


def k_suppress(
    df: DataFrame,
    quasi_cols: Sequence[str],
    k: int,
    mode: str = "drop",
) -> DataFrame:
    """k-anonymity suppression on the quasi-identifier combination.

    ``mode="drop"``: rows in groups smaller than k are removed.
    ``mode="null"``: rows survive but their quasi-identifiers are
    nulled (generalization to the maximum), keeping row counts intact
    for downstream statistics.
    """
    if mode not in ("drop", "null"):
        raise ValueError("mode must be 'drop' or 'null'")
    qc = list(quasi_cols)
    w = Window.partitionBy(*qc)
    sized = df.withColumn("__ksz", F.count(F.lit(1)).over(w))
    if mode == "drop":
        return sized.where(F.col("__ksz") >= k).drop("__ksz")
    out = sized
    for c in qc:
        out = out.withColumn(
            c, F.when(F.col("__ksz") >= k, F.col(c))
        )
    return out.drop("__ksz")
