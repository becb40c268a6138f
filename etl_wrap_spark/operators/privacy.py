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

from pyspark.sql import Column, DataFrame
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


# ------------------------------------------------ ε-DP noisy counts
# Discrete Laplace (two-sided geometric) mechanism — Ghosh, Roughgarden
# & Sundararajan, "Universally Utility-Maximizing Privacy Mechanisms"
# (SIAM J. Comput. 2012; public): P(noise = k) ∝ α^|k| with α = e^(-ε)
# is the universally-optimal ε-DP mechanism for count queries
# (sensitivity 1). Here α is a RATIONAL parameter and the inverse-CDF
# thresholds are computed in exact integer arithmetic, so the draw is
# bit-identical on any engine.

DP_HASH_BITS = 60  # uniform draw = portable md5-60 of salt:groupkey


def dp_noise_thresholds(
    alpha_num: int = 1, alpha_den: int = 2, m_max: int = 64
) -> list[int]:
    """Cumulative CDF thresholds for the noise MAGNITUDE, scaled to
    [0, 2^60) exact ints: P(M=0) = (1-α)/(1+α), P(M=m) = 2α^m(1-α)/(1+α).
    A uniform u < 2^60 maps to magnitude = #thresholds ≤ u (clamped at
    m_max; residual tail mass α^m_max is ~1e-20 at α=1/2)."""
    from fractions import Fraction

    a = Fraction(alpha_num, alpha_den)
    if not (0 < a < 1):
        raise ValueError(f"alpha must be in (0,1), got {a}")
    if m_max < 1:
        raise ValueError("m_max must be >= 1")
    scale = 1 << DP_HASH_BITS
    p0 = (1 - a) / (1 + a)
    cum = p0
    out = [int(cum * scale)]
    for m in range(1, m_max + 1):
        cum += 2 * a**m * p0  # P(M=m) = 2·α^m·(1-α)/(1+α), kept exact
        out.append(min(int(cum * scale), scale))
    return out


def dp_noise(key: Column, salt: str, thresholds: Sequence[int]) -> Column:
    """Deterministic discrete-Laplace noise for one group key: magnitude
    from the seeded uniform (md5-60 of salt:key) against the exact CDF
    thresholds, sign from an independent hash bit. Determinism is a
    FEATURE: re-running the same release with the same salt returns the
    same noise, so repeated identical queries cannot be averaged to
    strip it (the standard seeded-noise posture for reproducible
    pipelines); a NEW release must rotate the salt and account fresh ε."""
    from etl_wrap_spark.operators.text import hash60

    u = hash60(F.concat(F.lit(salt + ":"), key.cast("string")))
    arr = F.array(*[F.lit(t).cast("bigint") for t in thresholds])
    mag = F.size(F.filter(arr, lambda t: t <= u))
    sign = F.when(
        hash60(F.concat(F.lit(salt + ":s:"), key.cast("string"))) % 2 == 0, 1
    ).otherwise(-1)
    return (sign * mag).cast("bigint")


def dp_noisy_counts(
    df: DataFrame,
    group_cols: Sequence[str],
    salt: str,
    alpha_num: int = 1,
    alpha_den: int = 2,
    m_max: int = 64,
    out_col: str = "noisy_count",
    domain: DataFrame | None = None,
) -> DataFrame:
    """ε-DP noisy group counts → (group_cols…, noisy_count) with
    ε = ln(alpha_den/alpha_num) at row-level sensitivity 1 (ROW-level
    DP: one row in/out changes a count by ≤1; if one individual can
    contribute many rows, pre-aggregate per individual or scale ε).
    Never emits the true count. One aggregation; the noise is a pure
    Column expression over the group key — nothing driver-side, no RNG
    state to coordinate across executors (the classic distributed-DP
    failure mode this construction avoids).

    KNOWN-DOMAIN REQUIREMENT (round-4 ADVICE): without ``domain``, only
    keys PRESENT in the data are emitted — the released key set is
    data-dependent, so one individual's presence can add/remove an
    entire output row. That presence signal carries no noise, and the
    release is NOT ε-DP over an unknown group-key domain (the classic
    known-domain caveat). Pass ``domain`` — a frame of the PUBLIC key
    list (one row per releasable group, same group_cols) — to release
    over exactly that fixed set: absent groups get a noise-only count
    around 0, and keys outside the public list are never emitted. Only
    use ``domain=None`` when the key set itself is public knowledge."""
    thresholds = dp_noise_thresholds(alpha_num, alpha_den, m_max)
    key = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in group_cols])
    agg = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("__true")
    )
    if domain is not None:
        agg = (
            domain.select(*group_cols).distinct()
            .join(agg, on=list(group_cols), how="left")
            .withColumn("__true", F.coalesce(F.col("__true"), F.lit(0).cast("bigint")))
        )
    return (
        agg.withColumn(out_col, (F.col("__true") + dp_noise(key, salt, thresholds)))
        .drop("__true")
    )


def dp_noisy_sums(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    clamp_lo: int,
    clamp_hi: int,
    salt: str,
    alpha_num: int = 1,
    alpha_den: int = 2,
    m_max: int = 64,
    out_col: str = "noisy_sum",
    domain: DataFrame | None = None,
) -> DataFrame:
    """ε-DP noisy group sums: per-row contributions CLAMPED to
    [clamp_lo, clamp_hi] (bounding the sensitivity is what makes a sum
    releasable at all — one row then moves the sum by at most
    C = max(|lo|, |hi|)), exact-integer sum, then the same seeded
    discrete-Laplace draw as dp_noisy_counts. Privacy accounting: this
    α gives ε = C·ln(alpha_den/alpha_num) for row-level DP — for a
    target ε, pick α = exp(-ε/C) as a rational (larger alpha_den) or
    shrink the clamp. Same engine-portable, no-RNG-state posture as the
    count release. Same KNOWN-DOMAIN REQUIREMENT as dp_noisy_counts:
    pass ``domain`` (the public key list) to release over a fixed key
    set with noise-only sums for absent groups; with ``domain=None``
    the emitted key set is data-dependent and NOT protected."""
    thresholds = dp_noise_thresholds(alpha_num, alpha_den, m_max)
    key = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in group_cols])
    v = F.least(
        F.greatest(F.col(value_col).cast("bigint"), F.lit(clamp_lo)),
        F.lit(clamp_hi),
    )
    agg = (
        df.withColumn("__v", v)
        .groupBy(*group_cols)
        .agg(F.sum("__v").cast("bigint").alias("__true"))
    )
    if domain is not None:
        agg = (
            domain.select(*group_cols).distinct()
            .join(agg, on=list(group_cols), how="left")
            .withColumn("__true", F.coalesce(F.col("__true"), F.lit(0).cast("bigint")))
        )
    return (
        agg.withColumn(out_col, F.col("__true") + dp_noise(key, salt, thresholds))
        .drop("__true")
    )
