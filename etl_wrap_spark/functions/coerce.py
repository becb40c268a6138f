"""Type-coercion pipelines — the reference's load-time typing rules
(reference Wrap/DB.pm:241-311, SURVEY §2.3 P7-P11) as Column expressions.

The reference types data at load time from the target DB dictionary,
branching per TYPE_NAME and massaging each scalar with Perl regexes.
Here the same rules are declarative, codegen-friendly expressions a
caller applies per target-schema column; they run inside the scan
projection at any scale (no UDF, no driver loop).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_numerics(col: Column | str, thousandsep: str = ",", decimalsep: str = ".") -> Column:
    """P2 (reference Wrap/File.pm:427-434): strip thousand separators and
    normalize the decimal separator to '.', guarded by numeric-shape
    regexes (incl. scientific notation) so non-numeric strings pass
    through untouched."""
    c = F.col(col) if isinstance(col, str) else col
    ts, ds = "\\" + thousandsep, "\\" + decimalsep
    num_shape = f"^[+-]?\\d{{1,3}}({ts}\\d{{3}})*({ds}\\d+)?([eE][+-]?\\d+)?$"
    plain_shape = f"^[+-]?\\d+({ds}\\d+)?([eE][+-]?\\d+)?$"
    # Single-char separators (the only real case) replace via pure
    # char-level translate (no regex engine) — only the two anchored
    # shape GUARDS stay regex. Measured ~2x on the 600k-row coercion
    # bench query (each regexp_replace is a fresh java.util.regex scan
    # per row; translate is a byte loop).
    if len(thousandsep) == 1 and len(decimalsep) == 1:
        stripped = F.translate(c, thousandsep, "")
        dot = F.translate(stripped, decimalsep, ".")
        plain_dot = F.translate(c, decimalsep, ".")
    else:
        stripped = F.regexp_replace(c, ts, "")
        dot = F.regexp_replace(stripped, ds, ".")
        plain_dot = F.regexp_replace(c, ds, ".")
    return (
        F.when(c.rlike(num_shape), dot)
        .when(c.rlike(plain_shape), plain_dot)
        .otherwise(c)
    )


def coerce_number(col: Column | str) -> Column:
    """P7 (reference Wrap/DB.pm:244-256): numeric-family load coercion.

    - trailing '.0' tails collapse via cast
    - SAP postfix minus: '123-' → '-123'
    - '%' stripped
    - 'N/A' and non-numeric → NULL
    - subnormals (<1.79E-308 magnitude) → 0
    """
    c = (F.col(col) if isinstance(col, str) else col).cast("string")
    c = F.trim(c)
    # Anchored single-char tails: endswith + substring beat anchored
    # regexes (no regex scan on the ~all rows that don't carry the
    # tail; the rlike digit-shape guard only needs to run on rows that
    # DO end in '-').
    body = F.substring(c, 1, F.length(c) - F.lit(1))
    c = F.when(
        c.endswith("-") & body.rlike(r"^\d+(\.\d+)?$"),
        F.concat(F.lit("-"), body),
    ).otherwise(c)
    c = F.when(c.endswith("%"), F.substring(c, 1, F.length(c) - F.lit(1))).otherwise(c)
    d = c.try_cast("double")
    tiny = (F.abs(d) < 1.79e-308) & (F.abs(d) > 0)
    return F.when(tiny, F.lit(0.0)).otherwise(d)


def coerce_bool(col: Column | str) -> Column:
    """P8 (reference Wrap/DB.pm:258-262): WAHR/TRUE → true, FALSCH/FALSE →
    false, 0/1 pass through, anything else NULL."""
    c = F.upper(F.trim((F.col(col) if isinstance(col, str) else col).cast("string")))
    return (
        F.when(c.isin("WAHR", "TRUE", "1"), F.lit(True))
        .when(c.isin("FALSCH", "FALSE", "0"), F.lit(False))
        .otherwise(F.lit(None).cast("boolean"))
    )


def coerce_datetime(col: Column | str, cutoff_yr2000: int = 60) -> Column:
    """P9 (reference Wrap/DB.pm:264-302): the 12-format date/time thicket →
    TimestampType (the reference's ODBC canonical YYYY-MM-DD HH:MM:SS).

    Accepted shapes, in the reference's precedence order:
      DD.MM.YYYY [hh:mm[:ss]]          (German)
      YYYYMMDDhhmmss                   (SAP; second 60 → 59, Wrap/DB.pm:271)
      YYYYMMDD / YYYY.MM.DD / YYYY-MM-DD [hh:mm:ss]
      DD.MM.YY (two-digit year, century via cutoff window, Wrap/DB.pm:279-285)
      hh:mm[:ss] (bare time → 1900-01-01, Wrap/DB.pm:288-290)
      zero dates 00000000 / 0.0.0000 → NULL (Wrap/DB.pm:286-287)
    """
    # Shape-classify FIRST, then parse each shape with exactly one
    # formatter. A coalesce-of-10-parsers over a shared preprocessing
    # subtree replicates that subtree into every branch (Catalyst does
    # not CSE across try_to_timestamp args) — the expression grew past
    # janino's 64 KB codegen limit and fell back to interpretation.
    # The classified when-chain keeps the tree linear and codegen-able.
    c = F.trim((F.col(col) if isinstance(col, str) else col).cast("string"))
    ts = lambda x, fmt: F.try_to_timestamp(x, F.lit(fmt))  # noqa: E731
    yy = F.regexp_extract(c, r"\.(\d{2})$", 1).try_cast("int")
    century = F.when(yy >= cutoff_yr2000, F.lit("19")).otherwise(F.lit("20"))
    return (
        # zero dates → NULL (Wrap/DB.pm:286-287)
        F.when(c.rlike(r"^0{8}$") | c.rlike(r"^0\.0\.0{4}$") | (c == ""), F.lit(None).cast("timestamp"))
        # German day-first, optional time
        .when(c.rlike(r"^\d{1,2}\.\d{1,2}\.\d{4} \d{1,2}:\d{2}:\d{2}$"), ts(c, "d.M.yyyy H:mm:ss"))
        .when(c.rlike(r"^\d{1,2}\.\d{1,2}\.\d{4} \d{1,2}:\d{2}$"), ts(c, "d.M.yyyy H:mm"))
        .when(c.rlike(r"^\d{1,2}\.\d{1,2}\.\d{4}$"), ts(c, "d.M.yyyy"))
        # two-digit year with century window (Wrap/DB.pm:279-285);
        # day/month may be 1-digit like the reference's regex
        .when(
            c.rlike(r"^\d{1,2}\.\d{1,2}\.\d{2}$"),
            ts(
                F.concat(
                    F.regexp_extract(c, r"^(\d{1,2})\.", 1),
                    F.lit("."),
                    F.regexp_extract(c, r"^\d{1,2}\.(\d{1,2})\.", 1),
                    F.lit("."),
                    century,
                    F.regexp_extract(c, r"\.(\d{2})$", 1),
                ),
                "d.M.yyyy",
            ),
        )
        # SAP 14-digit, second 60 → 59 (Wrap/DB.pm:271)
        .when(
            c.rlike(r"^\d{12}60$"),
            ts(F.concat(F.substring(c, 1, 12), F.lit("59")), "yyyyMMddHHmmss"),
        )
        .when(c.rlike(r"^\d{14}$"), ts(c, "yyyyMMddHHmmss"))
        .when(c.rlike(r"^\d{8}$"), ts(c, "yyyyMMdd"))
        .when(c.rlike(r"^\d{4}\.\d{2}\.\d{2} \d{2}:\d{2}:\d{2}$"), ts(c, "yyyy.MM.dd HH:mm:ss"))
        .when(c.rlike(r"^\d{4}\.\d{2}\.\d{2}$"), ts(c, "yyyy.MM.dd"))
        .when(c.rlike(r"^\d{4}-\d{2}-\d{2} \d{1,2}:\d{2}:\d{2}$"), ts(c, "yyyy-MM-dd H:mm:ss"))
        .when(c.rlike(r"^\d{4}-\d{2}-\d{2} \d{1,2}:\d{2}$"), ts(c, "yyyy-MM-dd H:mm"))
        .when(c.rlike(r"^\d{4}-\d{2}-\d{2}$"), ts(c, "yyyy-MM-dd"))
        # bare time → 1900-01-01 (Wrap/DB.pm:288-290)
        .when(
            c.rlike(r"^\d{1,2}:\d{2}:\d{2}$"),
            ts(F.concat(F.lit("1900-01-01 "), c), "yyyy-MM-dd H:mm:ss"),
        )
        .when(c.rlike(r"^\d{1,2}:\d{2}$"), ts(F.concat(F.lit("1900-01-01 "), c), "yyyy-MM-dd H:mm"))
        .otherwise(F.lit(None).cast("timestamp"))
    )


def length_guard(col: Column | str, max_len: int) -> Column:
    """P10 (reference Wrap/DB.pm:305-308): oversize string → error marker.
    Returns a boolean 'violation' column; callers route violations to a
    quarantine frame instead of aborting the whole load (the distributed
    analogue of the reference's severity-2 abort)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c) > max_len


def strip_newlines(col: Column | str) -> Column:
    """P11 newline sanitization (Wrap/DB.pm:309-310); quote doubling is
    unnecessary under parameterized JDBC writes."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, r"[\r\n]", "")


def quarantine_split(df, violations: Column):
    """P12 (Wrap/DB.pm:232-234): split a frame into (good, quarantined).
    Both sides stay lazy; callers write them to separate sinks."""
    flagged = df.withColumn("__viol", violations)
    good = flagged.where(~F.col("__viol")).drop("__viol")
    bad = flagged.where(F.col("__viol")).drop("__viol")
    return good, bad
