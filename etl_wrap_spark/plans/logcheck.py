"""Log-existence monitoring (SURVEY §2.11 / §3.3): did the job start
today? — the semantics of the reference's checkLogExist.pl:21-104.

Frequency rules (checkLogExist.pl:32-55):
  B      every business day (skip weekends + holidays)   [default]
  D      every day
  M1     only on the 1st of the month
  Q      only on quarter starts (Jan 2!, Apr 1, Jul 1, Oct 1)
  ML     only on the last day of the month
  W<n>   only on weekday n (1=Sunday .. 7=Saturday)
  MW<n>  only on the first weekday-n of the month

A check scans the (tab-separated) log for a line whose first field
carries today's date in any of three dialects (Y/M/D, dd.mm.yyyy,
Y-M-D — checkLogExist.pl:75-89) and which matches the job's regex.
Alerting is the caller's concern: `run_checks` returns the failures.
"""

from __future__ import annotations

import datetime as _dt
import os
import re
from dataclasses import dataclass, field

from etl_wrap_spark.functions.holidays import is_holiday_py, is_nonworking_py


@dataclass
class LogCheck:
    job: str
    log_file: str
    pattern: str  # regex the matching line must contain
    freq: str = "B"
    time_to_check: str = ""  # "HH:MM:SS" — earliest time of day to check
    holiday_calendar: str = "AT"


@dataclass
class CheckResult:
    job: str
    ok: bool
    reason: str = ""


def due(check: LogCheck, now: _dt.datetime) -> bool:
    """Is the check due at `now` under its frequency rule?"""
    d, f = now.date(), check.freq
    if f == "B" and is_nonworking_py(check.holiday_calendar, d):
        return False
    if f == "M1" and d.day != 1:
        return False
    if f == "Q" and (d.month, d.day) not in ((1, 2), (4, 1), (7, 1), (10, 1)):
        return False
    if f == "ML" and (d + _dt.timedelta(days=1)).month == d.month:
        return False
    if f.startswith("W") and not f.startswith("MW"):
        # 1=Sunday .. 7=Saturday (reference weekday convention)
        if (d.isoweekday() % 7) + 1 != int(f[1]):
            return False
    if f.startswith("MW"):
        # MW<n> goes through the reference's first_week (DateUtil.pm:194-207,
        # called from checkLogExist.pl:51), whose digit is 0=Sunday..6=Saturday —
        # NOT the 1-based weekday() convention W<n> uses above.
        if (d.isoweekday() % 7) != int(f[2]) or d.day > 7:
            return False
    if check.time_to_check and now.strftime("%H:%M:%S") < check.time_to_check:
        return False
    return True


def _date_dialects(d: _dt.date) -> list[str]:
    return [d.strftime("%Y/%m/%d"), d.strftime("%d.%m.%Y"), d.strftime("%Y-%m-%d")]


def log_has_entry(path: str, pattern: str, day: _dt.date) -> bool:
    """Scan a tab-separated log: first field must carry `day` in one of
    the three date dialects AND the whole line must match `pattern`."""
    if not os.path.exists(path):
        return False
    rx = re.compile(pattern)
    dialects = _date_dialects(day)
    with open(path, encoding="utf-8", errors="replace") as fh:
        for line in fh:
            first = line.split("\t", 1)[0]
            if any(dd in first for dd in dialects) and rx.search(line):
                return True
    return False


def run_checks(checks: list[LogCheck], now: _dt.datetime | None = None) -> list[CheckResult]:
    now = now or _dt.datetime.now()
    out: list[CheckResult] = []
    for c in checks:
        if not due(c, now):
            continue
        if not os.path.exists(c.log_file):
            out.append(CheckResult(c.job, False, f"logfile missing: {c.log_file}"))
        elif log_has_entry(c.log_file, c.pattern, now.date()):
            out.append(CheckResult(c.job, True))
        else:
            out.append(CheckResult(c.job, False, f"no entry for {now.date()} matching /{c.pattern}/"))
    return out
