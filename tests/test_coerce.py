"""Golden tests for the type-coercion pipelines (reference Wrap/DB.pm
241-311) — the 12-format datetime thicket, numeric/bool rules."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from etl_wrap_spark.functions import coerce


def _run(spark, fn, values):
    df = spark.createDataFrame([(v,) for v in values], ["s"])
    return [r["out"] for r in df.select(fn("s").alias("out")).collect()]


def test_datetime_thicket(spark):
    cases = {
        "24.12.2023": dt.datetime(2023, 12, 24),
        "24.12.2023 10:30:15": dt.datetime(2023, 12, 24, 10, 30, 15),
        "24.12.2023 10:30": dt.datetime(2023, 12, 24, 10, 30),
        "20231224103015": dt.datetime(2023, 12, 24, 10, 30, 15),
        "20231224103060": dt.datetime(2023, 12, 24, 10, 30, 59),  # SAP second 60
        "20231224": dt.datetime(2023, 12, 24),
        "2023.12.24": dt.datetime(2023, 12, 24),
        "2023-12-24": dt.datetime(2023, 12, 24),
        "2023-12-24 10:30:15": dt.datetime(2023, 12, 24, 10, 30, 15),
        "24.12.95": dt.datetime(1995, 12, 24),  # century window: 95 >= 60 → 19xx
        "24.12.05": dt.datetime(2005, 12, 24),  # 05 < 60 → 20xx
        "4.3.99": dt.datetime(1999, 3, 4),  # 1-digit day/month, 2-digit year
        "1.2.2023": dt.datetime(2023, 2, 1),  # 1-digit day/month, 4-digit year
        "10:30:15": dt.datetime(1900, 1, 1, 10, 30, 15),  # bare time
        "10:30": dt.datetime(1900, 1, 1, 10, 30),
        "00000000": None,  # zero date
        "0.0.0000": None,
        "": None,
        "31.02.2023": None,  # invalid calendar date
        "garbage": None,
    }
    got = _run(spark, coerce.coerce_datetime, list(cases))
    assert got == list(cases.values())


def test_numeric_rules(spark):
    cases = {
        "123.45": 123.45,
        "123-": -123.0,  # SAP postfix minus
        "99%": 99.0,
        "N/A": None,
        "abc": None,
        "1e-310": 0.0,  # subnormal → 0
    }
    got = _run(spark, coerce.coerce_number, list(cases))
    assert got == pytest.approx(list(cases.values()), abs=1e-12) or got == list(cases.values())
    for g, e in zip(got, cases.values()):
        assert (g is None and e is None) or g == pytest.approx(e)


def test_bool_rules(spark):
    cases = {"WAHR": True, "TRUE": True, "1": True, "FALSCH": False, "false": False, "0": False, "x": None}
    got = _run(spark, coerce.coerce_bool, list(cases))
    assert got == list(cases.values())


def test_length_guard_and_quarantine(spark):
    df = spark.createDataFrame([("ok",), ("waytoolongvalue",)], ["s"])
    good, bad = coerce.quarantine_split(df, coerce.length_guard("s", 5))
    assert [r["s"] for r in good.collect()] == ["ok"]
    assert [r["s"] for r in bad.collect()] == ["waytoolongvalue"]


def test_strip_newlines(spark):
    got = _run(spark, coerce.strip_newlines, ["a\nb\rc"])
    assert got == ["abc"]
