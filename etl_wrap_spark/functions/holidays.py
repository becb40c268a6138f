"""Holiday calendars + business-day arithmetic (reference D16/D27/D29/D32).

Re-implements the semantics of ``Wrap/DateUtil.pm:134-171`` (is_holiday:
fixed lists per calendar BS/BF/AT/TG/UK, Easter via the Gauss computus at
``Wrap/DateUtil.pm:149-151``, UK first/last-Monday bank-holiday rules at
``:164-165``) — Spark-first: everything is a *pure Column expression*
(whole-stage-codegen friendly; no UDF, no join, no broadcast needed), so
``is_holiday_col`` can sit inside a filter over 100 TB and never leave the
JVM.  A generated calendar *dimension* DataFrame is also provided for
join-style usage and for SQL oracles.

Calendars: BS, BF, AT, TG (Target2), UK; WE = weekends-only; NO = none.
"""

from __future__ import annotations

import datetime as _dt
from functools import lru_cache

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

CALENDARS = ("BS", "BF", "AT", "TG", "UK")

# fixed holidays as (month, day) per calendar — cf. Wrap/DateUtil.pm:143-147
_FIXED = {
    "BS": [(1, 1), (1, 6), (5, 1), (8, 15), (10, 26), (11, 1), (12, 8), (12, 24), (12, 25), (12, 26)],
    "BF": [(1, 1), (1, 6), (5, 1), (8, 15), (10, 26), (11, 1), (12, 8), (12, 24), (12, 25), (12, 26)],
    "AT": [(1, 1), (1, 6), (5, 1), (8, 15), (10, 26), (11, 1), (12, 8), (12, 25), (12, 26)],
    "TG": [(1, 1), (5, 1), (12, 25), (12, 26)],
    "UK": [(1, 1), (12, 25), (12, 26)],
}

# easter-derived offsets (days from Easter Sunday) per calendar —
# cf. Wrap/DateUtil.pm:152-162
_EASTER_OFFSETS = {
    "BS": (1, 39, 50, 60, -2),  # Easter Mon, Ascension, Whit Mon, Corpus Christi, Good Friday
    "BF": (1, 39, 50, 60),
    "AT": (1, 39, 50, 60),
    "TG": (1, -2),
    "UK": (1, -2),
}


# ------------------------------------------------------------- Python side
def easter_sunday(year: int) -> _dt.date:
    """Gauss computus as used by the reference (Wrap/DateUtil.pm:149-151)."""
    d = (((255 - 11 * (year % 19)) - 21) % 30) + 21
    corr = 1 if d > 48 else 0
    offset = d + corr + 6 - ((year + year // 4 + d + corr + 1) % 7)
    return _dt.date(year, 3, 1) + _dt.timedelta(days=offset)


@lru_cache(maxsize=None)
def holiday_set(cal: str, year: int) -> frozenset[_dt.date]:
    """All holidays of `cal` in `year` (weekends NOT included)."""
    if cal in ("WE", "NO"):
        return frozenset()
    if cal not in _FIXED:
        raise ValueError(f"calendar <{cal}> not implemented")
    days = {_dt.date(year, m, d) for m, d in _FIXED[cal]}
    easter = easter_sunday(year)
    days.update(easter + _dt.timedelta(days=o) for o in _EASTER_OFFSETS[cal])
    if cal == "UK":
        days.update(_uk_bank_holidays(year))
    return frozenset(days)


def _uk_bank_holidays(year: int):
    # first Monday of May, last Monday of May, last Monday of August
    def first_monday(m):
        d = _dt.date(year, m, 1)
        return d + _dt.timedelta(days=(7 - d.weekday()) % 7)

    def last_monday(m):
        d = _dt.date(year, m + 1, 1) - _dt.timedelta(days=1)
        return d - _dt.timedelta(days=d.weekday())

    return [first_monday(5), last_monday(5), last_monday(8)]


def is_holiday_py(cal: str, date: _dt.date | str) -> bool:
    """Driver-side is_holiday: date may be YYYYMMDD string or date.

    Returns False for WE (weekends are checked separately, mirroring
    Wrap/DateUtil.pm:136).
    """
    if isinstance(date, str):
        date = _dt.datetime.strptime(date, "%Y%m%d").date()
    if cal in ("WE", "NO"):
        return False
    return date in holiday_set(cal, date.year)


def is_nonworking_py(cal: str, date: _dt.date | str) -> bool:
    """Weekend OR holiday under `cal` ('NO' → nothing is non-working)."""
    if isinstance(date, str):
        date = _dt.datetime.strptime(date, "%Y%m%d").date()
    if cal == "NO":
        return False
    if date.weekday() >= 5:
        return True
    return is_holiday_py(cal, date)


def add_days_hol_py(date: str, days: int, cal: str = "AT") -> _dt.date:
    """addDaysHol (Wrap/DateUtil.pm:276-289): add N calendar days, then
    roll FORWARD while the landing day is weekend/holiday."""
    d = _dt.datetime.strptime(date, "%Y%m%d").date() + _dt.timedelta(days=days)
    while is_nonworking_py(cal, d):
        d += _dt.timedelta(days=1)
    return d


def subtract_days_hol_py(date: str, days: int, cal: str = "AT") -> _dt.date:
    """subtractDaysHol (Wrap/DateUtil.pm:261-274): subtract, roll BACKWARD."""
    d = _dt.datetime.strptime(date, "%Y%m%d").date() - _dt.timedelta(days=days)
    while is_nonworking_py(cal, d):
        d -= _dt.timedelta(days=1)
    return d


# ------------------------------------------------------------- Column side
def _easter_sunday_col(year: Column) -> Column:
    """Easter Sunday as a date Column — the computus in pure arithmetic."""
    d = (((F.lit(255) - F.lit(11) * (year % 19)) - 21) % 30) + 21
    corr = F.when(d > 48, F.lit(1)).otherwise(F.lit(0))
    offset = d + corr + 6 - ((year + F.floor(year / 4) + d + corr + 1) % 7)
    return F.date_add(F.make_date(year, F.lit(3), F.lit(1)), offset.cast("int"))


def is_holiday_col(date: Column, cal: str) -> Column:
    """is_holiday as a pure expression (boolean Column). `cal` is a driver
    constant, matching the reference API where the calendar is config."""
    if cal in ("WE", "NO"):
        return F.lit(False)
    if cal not in _FIXED:
        raise ValueError(f"calendar <{cal}> not implemented")
    y, m, d = F.year(date), F.month(date), F.dayofmonth(date)
    cond = F.lit(False)
    for fm, fd in _FIXED[cal]:
        cond = cond | ((m == fm) & (d == fd))
    easter = _easter_sunday_col(y)
    for off in _EASTER_OFFSETS[cal]:
        cond = cond | (date == F.date_add(easter, off))
    if cal == "UK":
        dow = F.dayofweek(date)  # 2 = Monday
        is_mon = dow == 2
        cond = cond | (is_mon & (m == 5) & (d <= 7))  # first Monday of May
        cond = cond | (is_mon & (m == 5) & (d >= 25))  # last Monday of May
        cond = cond | (is_mon & (m == 8) & (d >= 25))  # last Monday of August
    return cond


def is_weekend_col(date: Column) -> Column:
    return F.dayofweek(date).isin(1, 7)


def is_nonworking_col(date: Column, cal: str) -> Column:
    if cal == "NO":
        return F.lit(False)
    return is_weekend_col(date) | is_holiday_col(date, cal)


# Longest possible run of consecutive non-working days across the supported
# calendars is 4 (e.g. Christmas 24-26 + weekend); 10 offsets give a wide
# safety margin. The roll is a higher-order `filter` over the candidate
# array so the (large) holiday expression appears exactly ONCE per roll —
# an unrolled coalesce-of-candidates repeats it 11x and multiplies codegen
# time by the roll width.
_MAX_ROLL = 10


def roll_forward_col(date: Column, cal: str) -> Column:
    """First working day at date+k (k = 0..N), i.e. advance while
    weekend/holiday."""
    candidates = F.transform(
        F.sequence(F.lit(0), F.lit(_MAX_ROLL)), lambda k: F.date_add(date, k)
    )
    return F.element_at(F.filter(candidates, lambda d: ~is_nonworking_col(d, cal)), 1)


def roll_backward_col(date: Column, cal: str) -> Column:
    candidates = F.transform(
        F.sequence(F.lit(0), F.lit(_MAX_ROLL)), lambda k: F.date_sub(date, k)
    )
    return F.element_at(F.filter(candidates, lambda d: ~is_nonworking_col(d, cal)), 1)


def add_days_hol_col(date: Column, days, cal: str = "AT") -> Column:
    return roll_forward_col(F.date_add(date, days), cal)


def subtract_days_hol_col(date: Column, days, cal: str = "AT") -> Column:
    return roll_backward_col(F.date_sub(date, days), cal)


# ------------------------------------------------------- calendar dimension
def holidays_df(spark: SparkSession, cal: str, year_from: int, year_to: int) -> DataFrame:
    """Holiday dimension table: one row per holiday date of `cal`.

    Built distributed (sequence+explode over years → holiday expression),
    so generating centuries of calendar is still a one-stage job. Useful
    for broadcast joins and as a SQL-visible table.
    """
    years = spark.range(year_from, year_to + 1).select(F.col("id").cast("int").alias("y"))
    days = years.select(
        F.explode(
            F.sequence(
                F.make_date(F.col("y"), F.lit(1), F.lit(1)),
                F.make_date(F.col("y"), F.lit(12), F.lit(31)),
            )
        ).alias("d")
    )
    return days.where(is_holiday_col(F.col("d"), cal)).select(F.col("d").alias("holiday"))


def business_days_df(spark: SparkSession, cal: str, date_from: str, date_to: str) -> DataFrame:
    """get_dateseries with a calendar (Wrap/DateUtil.pm:335-352), distributed:
    all business days in [date_from, date_to] (YYYYMMDD strings)."""
    span = spark.range(1).select(
        F.explode(
            F.sequence(
                F.to_date(F.lit(date_from), "yyyyMMdd"),
                F.to_date(F.lit(date_to), "yyyyMMdd"),
            )
        ).alias("d")
    )
    return span.where(~is_nonworking_col(F.col("d"), cal)).select(
        F.date_format("d", "yyyyMMdd").alias("date")
    )
