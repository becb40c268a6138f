"""Oracle-checked queries exercising the scalar function library
(SURVEY §2.8 D1-D36) and the type-coercion pipelines (§2.3 P2/P7-P9)
against the driver's parquet tables.

Oracle strategy: the DuckDB SQL for holiday/business-day semantics is
*generated* from the same Python holiday model the Column expressions
implement (literal IN-lists per calendar/year) — so both engines assert
one shared spec without sharing code paths.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_wrap_spark.catalog import register
from etl_wrap_spark.functions import coerce, dateutil
from etl_wrap_spark.functions.holidays import holiday_set
from etl_wrap_spark.session import load_tables

_YEARS = range(1994, 2004)  # covers the synthetic data's 1995-2001 span


def _hol_lits(cal: str) -> str:
    days = sorted(d for y in _YEARS for d in holiday_set(cal, y))
    return ", ".join(f"'{d.isoformat()}'" for d in days)


def _nonworking_sql(d: str, cal: str) -> str:
    return f"(isodow({d}) >= 6 OR strftime({d}, '%Y-%m-%d') IN ({_hol_lits(cal)}))"


def _roll_sql(d: str, cal: str, direction: int = 1) -> str:
    """First working day scanning from `d` (DATE expr) in `direction`."""
    cands = []
    for k in range(11):
        cd = f"({d} {'+' if direction > 0 else '-'} {k})"
        cands.append(f"CASE WHEN NOT {_nonworking_sql(cd, cal)} THEN {cd} END")
    return "COALESCE(" + ", ".join(cands) + ")"


# ------------------------------------------- D27: business-day arithmetic
@register(
    "q13_business_day_shift",
    oracle=f"""
    SELECT o_orderkey,
           strftime(CAST(o_orderdate AS DATE), '%Y%m%d') AS od,
           strftime({_roll_sql("(CAST(o_orderdate AS DATE) + 2)", "AT")}, '%Y%m%d') AS ship_at,
           strftime({_roll_sql("(CAST(o_orderdate AS DATE) + 2)", "UK")}, '%Y%m%d') AS ship_uk,
           strftime({_roll_sql("(CAST(o_orderdate AS DATE) - 1)", "TG", -1)}, '%Y%m%d') AS prev_tg
    FROM orders WHERE o_orderkey % 97 = 0
    ORDER BY o_orderkey
    """,
)
def q13_business_day_shift(spark, sf_dir):
    t = load_tables(spark, sf_dir, ["orders"])
    od = F.col("o_orderdate")
    return (
        t["orders"]
        .where(F.col("o_orderkey") % 97 == 0)
        .select(
            "o_orderkey",
            F.date_format(od.cast("date"), "yyyyMMdd").alias("od"),
            dateutil.add_days_hol(od, 2, "YMD", "AT").alias("ship_at"),
            dateutil.add_days_hol(od, 2, "YMD", "UK").alias("ship_uk"),
            dateutil.subtract_days_hol(od, 1, "YMD", "TG").alias("prev_tg"),
        )
        .orderBy("o_orderkey")
    )


# --------------------------------- D11-D16: calendar flags, aggregated/year
@register(
    "q14_holiday_profile",
    oracle=f"""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN isodow(CAST(o_orderdate AS DATE)) >= 6 THEN 1 ELSE 0 END) AS BIGINT) AS n_weekend,
           CAST(SUM(CASE WHEN strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') IN ({_hol_lits("AT")}) THEN 1 ELSE 0 END) AS BIGINT) AS n_hol_at,
           CAST(SUM(CASE WHEN strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') IN ({_hol_lits("UK")}) THEN 1 ELSE 0 END) AS BIGINT) AS n_hol_uk,
           CAST(SUM(CASE WHEN EXTRACT(day FROM o_orderdate) = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_first_dom,
           CAST(SUM(CASE WHEN CAST(o_orderdate AS DATE) = last_day(CAST(o_orderdate AS DATE)) THEN 1 ELSE 0 END) AS BIGINT) AS n_last_dom
    FROM orders GROUP BY yr ORDER BY yr
    """,
)
def q14_holiday_profile(spark, sf_dir):
    t = load_tables(spark, sf_dir, ["orders"])
    d = F.col("o_orderdate").cast("date")
    one = lambda c: F.sum(F.when(c, 1).otherwise(0))  # noqa: E731
    return (
        t["orders"]
        .groupBy(F.year("o_orderdate").cast("int").alias("yr"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            one(dateutil.is_weekend(d)).alias("n_weekend"),
            one(dateutil.is_holiday("AT", d)).alias("n_hol_at"),
            one(dateutil.is_holiday("UK", d)).alias("n_hol_uk"),
            one(dateutil.is_first_day_of_month(d)).alias("n_first_dom"),
            one(dateutil.is_last_day_of_month(d)).alias("n_last_dom"),
        )
        .orderBy("yr")
    )


# ------------------------------------ D28: addMonths overflow-roll semantics
@register(
    "q15_addmonths_overflow",
    oracle="""
    SELECT strftime(
             make_date(
               CAST(EXTRACT(year FROM o_orderdate) + ((EXTRACT(month FROM o_orderdate) - 1 + 16) // 12) AS INT),
               CAST(((EXTRACT(month FROM o_orderdate) - 1 + 16) % 12) + 1 AS INT),
               1
             ) + CAST(EXTRACT(day FROM o_orderdate) - 1 AS INT),
             '%Y%m%d') AS shifted,
           COUNT(*) AS n
    FROM orders GROUP BY shifted ORDER BY shifted
    """,
)
def q15_addmonths_overflow(spark, sf_dir):
    t = load_tables(spark, sf_dir, ["orders"])
    return (
        t["orders"]
        .groupBy(dateutil.add_months(F.col("o_orderdate"), 16).alias("shifted"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("shifted")
    )


# --------------------------- D32: business-day series (calendar dimension)
@register(
    "q16_business_day_series",
    oracle=f"""
    WITH days AS (
      SELECT CAST(g AS DATE) AS d
      FROM generate_series(DATE '1996-01-01', DATE '1996-12-31', INTERVAL 1 DAY) AS t(g)
      WHERE NOT {_nonworking_sql("CAST(g AS DATE)", "AT")}
    ), per_day AS (
      SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n
      FROM orders GROUP BY 1
    )
    SELECT strftime(days.d, '%Y%m%d') AS date, COALESCE(per_day.n, 0) AS n_orders
    FROM days LEFT JOIN per_day ON days.d = per_day.d
    ORDER BY date
    """,
)
def q16_business_day_series(spark, sf_dir):
    from etl_wrap_spark.functions.holidays import business_days_df

    t = load_tables(spark, sf_dir, ["orders"])
    days = business_days_df(spark, "AT", "19960101", "19961231")
    per_day = (
        t["orders"]
        .groupBy(F.date_format(F.col("o_orderdate").cast("date"), "yyyyMMdd").alias("date"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        days.join(per_day, on="date", how="left")
        .select("date", F.coalesce(F.col("n"), F.lit(0)).alias("n_orders"))
        .orderBy("date")
    )


# ----------------------- D4/D5/D14/D21-D24/D34: formatting & parsing surface
_MMM_EN = "CASE EXTRACT(month FROM {d}) " + " ".join(
    f"WHEN {i + 1} THEN '{m}'" for i, m in enumerate(dateutil._ABBREV_EN)
) + " END"
_MMM_DE = "CASE EXTRACT(month FROM {d}) " + " ".join(
    f"WHEN {i + 1} THEN '{m}'" for i, m in enumerate(dateutil._ABBREV_DE)
) + " END"


@register(
    "q17_format_conversions",
    oracle=f"""
    SELECT o_orderkey,
           strftime(o_orderdate, '%d.%m.%Y') AS dot_fmt,
           strftime(o_orderdate, '%d-') || {_MMM_EN.format(d="o_orderdate")} || strftime(o_orderdate, '-%Y') AS mmm_en,
           strftime(o_orderdate, '%d.') || {_MMM_DE.format(d="o_orderdate")} || strftime(o_orderdate, '.%Y') AS mmm_de,
           CAST(isodow(CAST(o_orderdate AS DATE)) % 7 + 1 AS INT) AS wd,
           strftime(o_orderdate, '%Y%m%d') AS roundtrip,
           CAST(epoch(CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP)) AS BIGINT) AS epoch_s
    FROM orders WHERE o_orderkey % 101 = 0
    ORDER BY o_orderkey
    """,
)
def q17_format_conversions(spark, sf_dir):
    t = load_tables(spark, sf_dir, ["orders"])
    # bind the defensive parse ONCE: each dateutil helper re-derives
    # _as_date(input) from whatever it is handed, so handing them the
    # raw column replicated the coalesce(try_cast, try_to_date) subtree
    # into every output expression (and CollapseProject inlines cheap
    # projections — a materialized non-cheap __d column it keeps).
    d = F.col("__d")
    ymd = F.date_format(d, "yyyyMMdd")
    return (
        t["orders"]
        .where(F.col("o_orderkey") % 101 == 0)
        .select(
            "o_orderkey",
            F.coalesce(
                F.col("o_orderdate").try_cast("date"),
                F.try_to_date(F.col("o_orderdate").cast("string"), "yyyyMMdd"),
            ).alias("__d"),
        )
        .select(
            "o_orderkey",
            dateutil.convert_to_ddmmyyyy(d).alias("dot_fmt"),
            dateutil.format_date(d, "D-MMM-Y").alias("mmm_en"),
            dateutil.format_date(d, "D.mmm.Y").alias("mmm_de"),
            dateutil.weekday(d).cast("int").alias("wd"),
            dateutil.convert_date(F.date_format(d, "yyyy.MM.dd")).alias("roundtrip"),
            dateutil.parse_from_yyyymmdd(ymd).cast("bigint").alias("epoch_s"),
        )
        .orderBy("o_orderkey")
    )


# ------------------------------- P2/P7: numeric coercion pipeline round-trip
@register(
    "q18_numeric_coercion",
    oracle="""
    WITH dirty AS (
      SELECT l_linenumber % 4 AS shape,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS VARCHAR) AS base
      FROM lineitem
    )
    SELECT shape,
           COUNT(*) AS n,
           COUNT(CASE WHEN shape <> 3 THEN 1 END) AS n_valid,
           CAST(CAST(SUM(CASE WHEN shape = 3 THEN NULL ELSE CAST(base AS DECIMAL(18,4)) END) AS VARCHAR) AS DOUBLE) AS total
    FROM dirty GROUP BY shape ORDER BY shape
    """,
)
def q18_numeric_coercion(spark, sf_dir):
    from etl_wrap_spark.session import ensure_min_parallelism

    t = load_tables(spark, sf_dir, ["lineitem"])
    # the render+coerce thicket is pure map work: spread the row-group
    # -bound scan first (3 partitions at sf0.1 -> session width;
    # measured 2.07s -> 1.43s)
    df = ensure_min_parallelism(t["lineitem"]).select(
        (F.col("l_linenumber") % 4).alias("shape"),
        F.col("l_extendedprice").cast("decimal(18,2)").cast("string").alias("base"),
    )
    base = F.col("base")
    rendered = (
        F.when(F.col("shape") == 0, F.translate(base, ".", ","))
        .when(F.col("shape") == 1, F.concat(base, F.lit("%")))
        .when(
            F.col("shape") == 2,
            F.concat(
                F.translate(base, "-", ""),
                F.when(base.startswith("-"), F.lit("-")).otherwise(F.lit("")),
            ),
        )
        .otherwise(F.lit("N/A"))
    )
    df = df.withColumn("s", rendered)
    # the engine path under test: German decimal-comma normalization, then
    # the numeric load coercion (percent strip, SAP minus, N/A → NULL)
    normalized = coerce.normalize_numerics(F.col("s"), thousandsep=".", decimalsep=",")
    value = coerce.coerce_number(F.when(F.col("shape") == 0, normalized).otherwise(F.col("s")))
    return (
        df.withColumn("v", value)
        .groupBy("shape")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("v").alias("n_valid"),
            F.sum(F.col("v").cast("decimal(18,4)")).cast("double").alias("total"),
        )
        .orderBy("shape")
    )


# ---------------------------- P9: datetime coercion over the format thicket
@register(
    "q19_datetime_coercion",
    oracle="""
    WITH shapes AS (
      SELECT o_orderkey % 5 AS shape, CAST(o_orderdate AS DATE) AS d FROM orders
    )
    SELECT shape, COUNT(*) AS n_parsed_ok, MIN(strftime(d, '%Y%m%d')) AS min_d, MAX(strftime(d, '%Y%m%d')) AS max_d
    FROM shapes GROUP BY shape ORDER BY shape
    """,
)
def q19_datetime_coercion(spark, sf_dir):
    t = load_tables(spark, sf_dir, ["orders"])
    base = t["orders"].select(
        (F.col("o_orderkey") % 5).alias("shape"),
        F.col("o_orderdate").cast("date").alias("d"),
    )
    d = F.col("d")
    rendered = (
        F.when(F.col("shape") == 0, F.date_format(d, "dd.MM.yyyy"))
        .when(F.col("shape") == 1, F.date_format(d, "yyyyMMddHHmmss"))
        .when(F.col("shape") == 2, F.date_format(d, "yyyy-MM-dd"))
        .when(F.col("shape") == 3, F.date_format(d, "yyyy.MM.dd"))
        .otherwise(F.date_format(d, "dd.MM.yy"))  # 2-digit year, century window
    )
    parsed = coerce.coerce_datetime(rendered).cast("date")
    return (
        base.withColumn("parsed", parsed)
        .where(F.col("parsed") == F.col("d"))  # count only exact round-trips
        .groupBy("shape")
        .agg(
            F.count(F.lit(1)).alias("n_parsed_ok"),
            F.min(F.date_format("d", "yyyyMMdd")).alias("min_d"),
            F.max(F.date_format("d", "yyyyMMdd")).alias("max_d"),
        )
        .orderBy("shape")
    )


# ------------------------- D30/D31: German number formatting round-trip
@register(
    "q53_german_number_format",
    oracle="""
    WITH d AS (
      SELECT o_orderkey,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS base
      FROM orders WHERE o_orderkey % 211 = 0
    )
    SELECT o_orderkey,
           base,
           trim(leading '.' FROM reverse(regexp_replace(reverse(string_split(base,'.')[1]), '(...)', '\\1.', 'g')))
             || ',' || string_split(base,'.')[2] AS german,
           replace(base, '.', ',') AS comma_form
    FROM d ORDER BY o_orderkey
    """,
)
def q53_german_number_format(spark, sf_dir):
    from etl_wrap_spark.functions.dateutil import convert_to_thousend_decimal, convertcomma

    t = load_tables(spark, sf_dir, ["orders"])
    base = F.col("o_totalprice").cast("decimal(18,2)").cast("string")
    return (
        t["orders"]
        .where(F.col("o_orderkey") % 211 == 0)
        .select(
            "o_orderkey",
            base.alias("base"),
            convert_to_thousend_decimal(base).alias("german"),
            convertcomma(base).alias("comma_form"),
        )
        .orderBy("o_orderkey")
    )
