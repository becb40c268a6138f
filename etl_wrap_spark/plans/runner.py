"""Pipeline runner (SURVEY §2.11): start gating, retry state machine,
processed-file ledger — the reference's processingEnd/retrySleepAbort
loop (Wrap.pm:528-631) and setupStarting gates (Wrap/Common.pm:296-340)
as a driver-side state machine around lazy DataFrame loads.

Batch loads that poll a directory should prefer the streaming module
(checkpointed file source) — this runner exists for reference-parity
process scripts and for gates/retries around arbitrary callables.
"""

from __future__ import annotations

import datetime as _dt
import json
import os
import time
from collections.abc import Callable
from dataclasses import dataclass, field

from etl_wrap_spark.functions.holidays import is_holiday_py, is_nonworking_py


# ------------------------------------------------------------- start gating
def should_start(
    today: _dt.date,
    skip_weekends: bool = False,
    skip_holidays: bool | str = False,
    skip_for_first_business_date: bool | str = False,
    holiday_calendar: str = "AT",
) -> bool:
    """setupStarting (Wrap/Common.pm:296-340): holiday/weekend gates and
    the 'only run on the first business day of the month' rule."""
    if skip_weekends and today.weekday() >= 5:
        return False
    if skip_holidays:
        cal = skip_holidays if isinstance(skip_holidays, str) else holiday_calendar
        if is_holiday_py(cal, today):
            return False
    if skip_for_first_business_date:
        cal = (
            skip_for_first_business_date
            if isinstance(skip_for_first_business_date, str)
            else holiday_calendar
        )
        d = today.replace(day=1)
        while is_nonworking_py(cal, d):
            d += _dt.timedelta(days=1)
        if today != d:
            return False
    return True


# --------------------------------------------------------- retry state machine
@dataclass
class RetryPolicy:
    """retrySeconds/plannedUntil semantics (Wrap.pm:604-631): retry every
    `retry_seconds` until `planned_until` (HHMM, same day) or midnight."""

    retry_seconds: int = 60
    planned_until: str | None = None  # "HHMM"

    def deadline(self, now: _dt.datetime) -> _dt.datetime:
        if self.planned_until:
            hh, mm = int(self.planned_until[:2]), int(self.planned_until[2:])
            return now.replace(hour=hh, minute=mm, second=0, microsecond=0)
        return now.replace(hour=23, minute=59, second=59, microsecond=0)


@dataclass
class RunReport:
    attempts: int = 0
    succeeded: bool = False
    errors: list[str] = field(default_factory=list)


def run_with_retry(
    fn: Callable[[], None],
    policy: RetryPolicy,
    now_fn: Callable[[], _dt.datetime] = _dt.datetime.now,
    sleep_fn: Callable[[float], None] = time.sleep,
) -> RunReport:
    """Run `fn` until success or deadline; first-run-success suppresses
    repeat error noise exactly like firstRunSuccess (Wrap.pm:568)."""
    report = RunReport()
    deadline = policy.deadline(now_fn())
    while True:
        report.attempts += 1
        try:
            fn()
            report.succeeded = True
            return report
        except Exception as e:  # noqa: BLE001 — the loop IS the error boundary
            report.errors.append(f"attempt {report.attempts}: {e}")
        if now_fn() + _dt.timedelta(seconds=policy.retry_seconds) > deadline:
            return report
        sleep_fn(policy.retry_seconds)


# --------------------------------------------------------- processed ledger
class ProcessedLedger:
    """markProcessed (Wrap.pm:429-449): idempotent file bookkeeping for
    batch (non-streaming) loads. Structured Streaming checkpoints
    subsume this for streaming ingest; this exists for one-shot loads.

    The ledger is a JSON-lines file of (path, size, mtime) — a file is
    'new' if its identity tuple is unseen."""

    def __init__(self, ledger_path: str):
        self.path = ledger_path
        self._seen: set[tuple[str, int, int]] = set()
        if os.path.exists(ledger_path):
            with open(ledger_path) as fh:
                for line in fh:
                    rec = json.loads(line)
                    self._seen.add((rec["path"], rec["size"], rec["mtime"]))

    def _identity(self, path: str) -> tuple[str, int, int]:
        st = os.stat(path)
        return (os.path.abspath(path), st.st_size, int(st.st_mtime))

    def unprocessed(self, paths: list[str]) -> list[str]:
        return [p for p in paths if self._identity(p) not in self._seen]

    def mark(self, paths: list[str]) -> None:
        with open(self.path, "a") as fh:
            for p in paths:
                ident = self._identity(p)
                if ident not in self._seen:
                    self._seen.add(ident)
                    fh.write(
                        json.dumps({"path": ident[0], "size": ident[1], "mtime": ident[2]}) + "\n"
                    )


def check_files(paths: list[str], optional: set[str] | None = None) -> list[str]:
    """checkFiles gate (Wrap.pm:237-282): every expected file must exist;
    missing non-optional files raise, missing optional files drop out."""
    present, missing = [], []
    for p in paths:
        (present if os.path.exists(p) else missing).append(p)
    fatal = [p for p in missing if not (optional and p in optional)]
    if fatal:
        raise FileNotFoundError(f"missing required input files: {fatal}")
    return present
