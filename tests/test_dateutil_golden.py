"""Assertion-for-assertion port of the reference's t/DateUtil.t (171
planned tests; 156 is()/like() assertions).

Mapping notes (the full parity table is COVERAGE.md §2.8):
- boolean returns: the reference renders false as "" and true as 1;
  here they are real booleans.
- epoch functions are UTC by documented divergence (the reference's
  asserted -3600 offsets are Vienna local time): parseFromDDMMYYYY
  ("01.01.1970") is 0 here, and all day-difference assertions are
  preserved verbatim.
- "invalid date" returns are NULL here (documented in functions/
  dateutil.py docstrings).
- the ~10 volatile like() assertions (get_curdate*/get_curtime*) are
  covered by test_dateutil.py::test_volatile_formats; the 3 addDays
  Perl ref-mutation assertions ($day/$month/$year in-out args) have no
  Column analogue — the returned value assertion is ported.
- the Time::Piece-object variant of convertEpochToYYYYMMDD is
  Perl-specific; the epoch-seconds variant is ported.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.functions import lit

from etl_wrap_spark.functions import dateutil as du

# ---- t/DateUtil.t:5-6 — get_dateseries("20150102","20150302","AT")
DATESERIES_EXPECTED = [
    "20150102", "20150105", "20150107", "20150108", "20150109", "20150112", "20150113",
    "20150114", "20150115", "20150116", "20150119", "20150120", "20150121", "20150122",
    "20150123", "20150126", "20150127", "20150128", "20150129", "20150130", "20150202",
    "20150203", "20150204", "20150205", "20150206", "20150209", "20150210", "20150211",
    "20150212", "20150213", "20150216", "20150217", "20150218", "20150219", "20150220",
    "20150223", "20150224", "20150225", "20150226", "20150227", "20150302",
]

# (label, expr-thunk, expected) — one row per reference assertion, in file order.
CASES = [
    # t:7-10 is_weekend
    ("is_weekend 20150102", lambda: du.is_weekend(lit("20150102")), False),
    ("is_weekend 20150103", lambda: du.is_weekend(lit("20150103")), True),
    ("is_weekend 20150104", lambda: du.is_weekend(lit("20150104")), True),
    ("is_weekend 20150105", lambda: du.is_weekend(lit("20150105")), False),
    # t:11-17 weekday (1=Sunday..7=Saturday)
    ("weekday 20180801", lambda: du.weekday(lit("20180801")), 4),
    ("weekday 20180802", lambda: du.weekday(lit("20180802")), 5),
    ("weekday 20180803", lambda: du.weekday(lit("20180803")), 6),
    ("weekday 20180804", lambda: du.weekday(lit("20180804")), 7),
    ("weekday 20180805", lambda: du.weekday(lit("20180805")), 1),
    ("weekday 20180806", lambda: du.weekday(lit("20180806")), 2),
    ("weekday 20180807", lambda: du.weekday(lit("20180807")), 3),
    # t:18-22 addMonths (overflow-roll: +16 lands on 20140302, never 20140230)
    ("addMonths+1", lambda: du.add_months(lit("20121030"), 1), "20121130"),
    ("addMonths+3", lambda: du.add_months(lit("20121030"), 3), "20130130"),
    ("addMonths+13", lambda: du.add_months(lit("20121030"), 13), "20131130"),
    ("addMonths+14", lambda: du.add_months(lit("20121030"), 14), "20131230"),
    ("addMonths+16 roll", lambda: du.add_months(lit("20121030"), 16), "20140302"),
    # t:23-30 addDaysHol default AT (each lands after a weekend/holiday)
    ("addDaysHol newyear", lambda: du.add_days_hol(lit("20111231"), 1), "20120102"),
    ("addDaysHol epiphany", lambda: du.add_days_hol(lit("20120105"), 1), "20120109"),
    ("addDaysHol mayday", lambda: du.add_days_hol(lit("20120430"), 1), "20120502"),
    ("addDaysHol assumption", lambda: du.add_days_hol(lit("20120814"), 1), "20120816"),
    ("addDaysHol national", lambda: du.add_days_hol(lit("20121025"), 1), "20121029"),
    ("addDaysHol allsaints", lambda: du.add_days_hol(lit("20121031"), 1), "20121102"),
    ("addDaysHol maryconc", lambda: du.add_days_hol(lit("20121207"), 1), "20121210"),
    ("addDaysHol christmas", lambda: du.add_days_hol(lit("20121224"), 1), "20121227"),
    # t:31-32 weekend-only / no-holiday calendars
    ("addDaysHol WE", lambda: du.add_days_hol(lit("20121224"), 1, "YMD", "WE"), "20121225"),
    ("addDaysHol NO", lambda: du.add_days_hol(lit("20220429"), 1, "YMD", "NO"), "20220430"),
    # t:33-38 addDaysHol with format templates
    ("addDaysHol D.M.Y", lambda: du.add_days_hol(lit("20120405"), 1, "D.M.Y"), "06.04.2012"),
    ("addDaysHol D-M-Y", lambda: du.add_days_hol(lit("20120408"), 1, "D-M-Y"), "10-04-2012"),
    ("addDaysHol Y-M-D", lambda: du.add_days_hol(lit("20120516"), 1, "Y-M-D"), "2012-05-18"),
    ("addDaysHol D-MMM-Y", lambda: du.add_days_hol(lit("20120527"), 1, "D-MMM-Y"), "29-May-2012"),
    ("addDaysHol D/M/Y", lambda: du.add_days_hol(lit("20120606"), 1, "D/M/Y"), "08/06/2012"),
    ("addDaysHol D.mmm.Y", lambda: du.add_days_hol(lit("20121224"), 1, "D.mmm.Y"), "27.Dez.2012"),
    # t:39-43 subtractDaysHol
    ("subDaysHol newyear", lambda: du.subtract_days_hol(lit("20120102"), 1), "20111230"),
    ("subDaysHol mayday", lambda: du.subtract_days_hol(lit("20120502"), 1), "20120430"),
    ("subDaysHol WE", lambda: du.subtract_days_hol(lit("20121224"), 1, "YMD", "WE"), "20121221"),
    ("subDaysHol NO", lambda: du.subtract_days_hol(lit("20220502"), 1, "YMD", "NO"), "20220501"),
    ("subDaysHol BF xmas", lambda: du.subtract_days_hol(lit("20191227"), 1, "YMD", "BF"), "20191223"),
    # t:44-49 yesterday-holiday chain (BF calendar over the 2019 Christmas block)
    ("yday hol 1227", lambda: du.is_holiday("BF", du.subtract_days_hol(lit("20191227"), 1, "YMD", "WE")), True),
    ("yday hol 1226", lambda: du.is_holiday("BF", du.subtract_days_hol(lit("20191226"), 1, "YMD", "WE")), True),
    ("yday hol 1225", lambda: du.is_holiday("BF", du.subtract_days_hol(lit("20191225"), 1, "YMD", "WE")), True),
    ("yday no hol 1224", lambda: du.is_holiday("BF", du.subtract_days_hol(lit("20191224"), 1, "YMD", "WE")), False),
    ("yday no hol 1223", lambda: du.is_holiday("BF", du.subtract_days_hol(lit("20191223"), 1, "YMD", "WE")), False),
    ("yday no hol 1209", lambda: du.is_holiday("BF", du.subtract_days_hol(lit("20191209"), 1, "YMD", "WE")), False),
    # t:51 addDays (returned value; the Perl in-out refs have no analogue)
    ("addDays 01.01.2007+1", lambda: du.add_days(lit("20070101"), 1), "02-Jan-2007"),
    # t:55-63 first_week battery
    ("first_week 7.5.2018 Mon May", lambda: du.first_week(lit("20180507"), 1, 5), True),
    ("first_weekYMD Mon May", lambda: du.first_week(lit("20180507"), 1, 5), True),
    ("first_weekYMD Tue", lambda: du.first_week(lit("20210105"), 2), True),
    ("first_weekYMD Wed", lambda: du.first_week(lit("20210106"), 3), True),
    ("first_weekYMD Thu", lambda: du.first_week(lit("20210107"), 4), True),
    ("first_weekYMD Fri", lambda: du.first_week(lit("20210101"), 5), True),
    ("first_weekYMD Sat", lambda: du.first_week(lit("20210102"), 6), True),
    ("first_weekYMD Sun", lambda: du.first_week(lit("20210103"), 0), True),
    ("first_weekYMD Mon no-month", lambda: du.first_week(lit("20180507"), 1), True),
    # t:65-70 last_week battery
    ("last_week May Mon", lambda: du.last_week(lit("20180528"), 1, 5), True),
    ("last_week Aug Mon", lambda: du.last_week(lit("20180827"), 1, 8), True),
    ("last_week Dec Fri", lambda: du.last_week(lit("20181228"), 5, 12), True),
    ("last_weekYMD Dec Fri", lambda: du.last_week(lit("20181228"), 5, 12), True),
    ("last_weekYMD Fri no-month", lambda: du.last_week(lit("20181228"), 5), True),
    # t:72 first sunday
    ("first_week Jan Sun", lambda: du.first_week(lit("20180107"), 0, 1), True),
]

# t:73-78 five-calendar holiday battery
for _cal in ("BS", "BF", "AT", "TG", "UK"):
    CASES += [
        (f"hol {_cal} newyear", (lambda c: lambda: du.is_holiday(c, lit("20180101")))(_cal), True),
        (f"hol {_cal} xmas", (lambda c: lambda: du.is_holiday(c, lit("20181225")))(_cal), True),
        (f"hol {_cal} boxing", (lambda c: lambda: du.is_holiday(c, lit("20181226")))(_cal), True),
        (f"hol {_cal} 0502", (lambda c: lambda: du.is_holiday(c, lit("20180502")))(_cal), False),
    ]

CASES += [
    # t:79-96 AT singles (incl. the christmas-eve triple, written AT thrice in the reference)
    ("AT newyear12", lambda: du.is_holiday("AT", lit("20120101")), True),
    ("AT epiphany", lambda: du.is_holiday("AT", lit("20120106")), True),
    ("AT easter monday12", lambda: du.is_holiday("AT", lit("20120409")), True),
    ("AT mayday", lambda: du.is_holiday("AT", lit("20120501")), True),
    ("AT ascension", lambda: du.is_holiday("AT", lit("20120517")), True),
    ("AT whit monday", lambda: du.is_holiday("AT", lit("20120528")), True),
    ("AT corpus christi", lambda: du.is_holiday("AT", lit("20120607")), True),
    ("AT assumption", lambda: du.is_holiday("AT", lit("20120815")), True),
    ("AT national", lambda: du.is_holiday("AT", lit("20121026")), True),
    ("AT allsaints", lambda: du.is_holiday("AT", lit("20121101")), True),
    ("AT mary conception", lambda: du.is_holiday("AT", lit("20121208")), True),
    ("AT xmas eve a", lambda: du.is_holiday("AT", lit("20121224")), False),
    ("AT xmas eve b", lambda: du.is_holiday("AT", lit("20121224")), False),
    ("AT xmas eve c", lambda: du.is_holiday("AT", lit("20121224")), False),
    ("AT xmas day", lambda: du.is_holiday("AT", lit("20121225")), True),
    ("AT boxing day", lambda: du.is_holiday("AT", lit("20121226")), True),
    # t:97-99 good friday split
    ("AT good friday", lambda: du.is_holiday("AT", lit("20120406")), False),
    ("BS good friday", lambda: du.is_holiday("BS", lit("20120406")), True),
    ("BF good friday", lambda: du.is_holiday("BF", lit("20120406")), False),
    # t:100-103 UK
    ("UK mayday", lambda: du.is_holiday("UK", lit("20180507")), True),
    ("UK spring bank", lambda: du.is_holiday("UK", lit("20180528")), True),
    ("UK summer bank", lambda: du.is_holiday("UK", lit("20180827")), True),
    ("UK no labour day", lambda: du.is_holiday("UK", lit("20180501")), False),
    # t:104-110 TG (Target)
    ("TG no uk mayday", lambda: du.is_holiday("TG", lit("20180507")), False),
    ("TG no spring bank", lambda: du.is_holiday("TG", lit("20180528")), False),
    ("TG no summer bank", lambda: du.is_holiday("TG", lit("20180827")), False),
    ("TG newyear", lambda: du.is_holiday("TG", lit("20180101")), True),
    ("TG mayday", lambda: du.is_holiday("TG", lit("20180501")), True),
    ("TG xmas", lambda: du.is_holiday("TG", lit("20181225")), True),
    ("TG boxing", lambda: du.is_holiday("TG", lit("20181226")), True),
    # t:111 easter monday 2021
    ("AT easter monday21", lambda: du.is_holiday("AT", lit("20210405")), True),
    # t:112-119 month edges (incl. leap-year February)
    ("first_dom true", lambda: du.is_first_day_of_month(lit("20190101")), True),
    ("first_dom false", lambda: du.is_first_day_of_month(lit("20190102")), False),
    ("last_dom true", lambda: du.is_last_day_of_month(lit("20190131")), True),
    ("last_dom false", lambda: du.is_last_day_of_month(lit("20190130")), False),
    ("last_dom feb", lambda: du.is_last_day_of_month(lit("20190228")), True),
    ("last_dom feb leap", lambda: du.is_last_day_of_month(lit("20200229")), True),
    ("last_dom 28 feb leap", lambda: du.is_last_day_of_month(lit("20200228")), False),
    # t:120-121 last business day of month (WE calendar)
    ("last_bday apr22", lambda: du.is_last_day_of_month(lit("20220429"), "WE"), True),
    ("not last_bday apr22", lambda: du.is_last_day_of_month(lit("20220428"), "WE"), False),
    # t:122-126 first/last_week 2019
    ("first_week may19 mon", lambda: du.first_week(lit("20190506"), 1, 5), True),
    ("first_week not monday", lambda: du.first_week(lit("20190507"), 1, 5), False),
    ("first_week not first", lambda: du.first_week(lit("20190513"), 1, 5), False),
    ("last_week may19 mon", lambda: du.last_week(lit("20190527"), 1, 5), True),
    ("last_week false", lambda: du.last_week(lit("20190510"), 1, 5), False),
    # t:130-133 formatDate family (incl. German mmm)
    ("formatDate D.M.Y", lambda: du.format_date(lit("20190101"), "D.M.Y"), "01.01.2019"),
    ("formatDate D.MMM.Y", lambda: du.format_date(lit("20190301"), "D.MMM.Y"), "01.Mar.2019"),
    ("formatDate D.mmm.Y", lambda: du.format_date(lit("20190301"), "D.mmm.Y"), "01.Mär.2019"),
    ("formatDateFromYYYYMMDD", lambda: du.format_date_from_yyyymmdd(lit("20190101"), "D.M.Y"), "01.01.2019"),
    # t:134-135 plus_X_years (with date / with date + subtract)
    ("plusXyears date", lambda: du.get_curdate_dash_plus_x_years(100, lit("20190101")), "01-01-2119"),
    ("plusXyears date-4d", lambda: du.get_curdate_dash_plus_x_years(100, lit("20190105"), 4), "01-01-2119"),
    # t:148-152 German thousand/decimal formatting
    ("thousend decimal", lambda: du.convert_to_thousend_decimal(lit("123456789.12")), "123.456.789,12"),
    ("thousend integer", lambda: du.convert_to_thousend_decimal(lit("123456789")), "123.456.789,0"),
    ("thousend zero", lambda: du.convert_to_thousend_decimal(lit("0")), "0,0"),
    ("thousend zero nodec", lambda: du.convert_to_thousend_decimal(lit("0"), True), "0"),
    ("thousend nodec", lambda: du.convert_to_thousend_decimal(lit("12345.20"), True), "12.345"),
    # t:153-157 epoch parses — UTC (documented divergence from the
    # reference's Vienna-local -3600 offsets); day-diffs are verbatim
    ("parse 01.01.1970", lambda: du.parse_from_ddmmyyyy(lit("01.01.1970")), 0),
    ("parse 02.01.1970", lambda: du.parse_from_ddmmyyyy(lit("02.01.1970")), 24 * 60 * 60),
    ("parse 19700102", lambda: du.parse_from_yyyymmdd(lit("19700102")), 24 * 60 * 60),
    ("diff 2 days", lambda: (du.parse_from_yyyymmdd(lit("19700103"))
                             - du.parse_from_yyyymmdd(lit("19700101"))) / (24 * 60 * 60), 2.0),
    ("diff 3 days mixed", lambda: (du.parse_from_yyyymmdd(lit("20191104"))
                                   - du.parse_from_ddmmyyyy(lit("01.11.2019"))) / (24 * 60 * 60), 3.0),
    # t:158-163 invalid dates → NULL (reference: the string "invalid date")
    ("invalid day 0", lambda: du.parse_from_yyyymmdd(lit("19000100")), None),
    ("invalid month 13", lambda: du.parse_from_ddmmyyyy(lit("01.13.2001")), None),
    ("invalid empty", lambda: du.parse_from_yyyymmdd(lit("")), None),
    ("invalid year 1801", lambda: du.parse_from_ddmmyyyy(lit("01.01.1801")), None),
    ("invalid day 32", lambda: du.parse_from_yyyymmdd(lit("20010132")), None),
    ("invalid day 00", lambda: du.parse_from_ddmmyyyy(lit("00.01.1901")), None),
    # t:164 epoch round-trip (t:165's Time::Piece variant is Perl-specific)
    ("epoch roundtrip", lambda: du.convert_epoch_to_yyyymmdd(du.parse_from_yyyymmdd(lit("20010131"))), "20010131"),
    # t:166-169 get_last_day_of_month
    ("ldom dec", lambda: du.get_last_day_of_month(lit("20011215")), "20011231"),
    ("ldom jan", lambda: du.get_last_day_of_month(lit("20010115")), "20010131"),
    ("ldom feb", lambda: du.get_last_day_of_month(lit("20010215")), "20010228"),
    ("ldom feb leap", lambda: du.get_last_day_of_month(lit("20040215")), "20040229"),
]

_BATCH = 30  # keep each generated plan well under the 64KB codegen method limit


@pytest.mark.parametrize("start", range(0, len(CASES), _BATCH))
def test_golden_parity_batch(spark, start):
    batch = CASES[start : start + _BATCH]
    row = spark.range(1).select(
        *[case[1]().alias(f"c{i}") for i, case in enumerate(batch)]
    ).first()
    for i, (label, _fn, expected) in enumerate(batch):
        got = row[f"c{i}"]
        if isinstance(expected, float):
            assert got == pytest.approx(expected), f"{label}: {got!r} != {expected!r}"
        else:
            assert got == expected, f"{label}: {got!r} != {expected!r}"


def test_golden_dateseries(spark):
    got = spark.range(1).select(
        du.get_dateseries(lit("20150102"), lit("20150302"), "AT").alias("s")
    ).first()["s"]
    assert got == DATESERIES_EXPECTED
