"""Tests for the config cascade and runner state machine (no Spark)."""

import datetime as dt

import pytest

from etl_wrap_spark.plans.config import (
    ConfigError,
    parse_cli_overrides,
    setup_config_merge,
    validate,
)
from etl_wrap_spark.plans.runner import (
    ProcessedLedger,
    RetryPolicy,
    RunReport,
    check_files,
    run_with_retry,
    should_start,
)


def test_cascade_precedence():
    site = {"process": {"retrySeconds": 60}, "DB": {"schemaName": "dbo"}}
    common = {"DB": {"table": "t_common"}}
    loads = [{"DB": {"table": "t_load"}}, {"File": {"filename": "f.csv"}}]
    final = setup_config_merge(site, common, loads, ["--load1DB", "table=t_cli"])
    assert final[0]["DB"]["table"] == "t_load"  # load wins over common
    assert final[0]["DB"]["schemaName"] == "dbo"  # site survives
    assert final[1]["DB"]["table"] == "t_cli"  # CLI wins over everything
    assert final[0]["process"]["retrySeconds"] == 60


def test_validation_rejects_unknown_and_mistyped():
    with pytest.raises(ConfigError, match="unknown key"):
        validate({"DB": {"nosuchkey": 1}})
    with pytest.raises(ConfigError, match="expects"):
        validate({"process": {"retrySeconds": "sixty"}})
    with pytest.raises(ConfigError, match="unknown config namespace"):
        validate({"Nope": {}})


def test_cli_parse():
    common, per_load = parse_cli_overrides(
        ["--DB", "table=x", "--load2File", "format_skip=3", "--process", "interactive=true"]
    )
    assert common == {"DB": {"table": "x"}, "process": {"interactive": True}}
    assert per_load == {2: {"File": {"format_skip": 3}}}


def test_should_start_gates():
    sat = dt.date(2024, 1, 6)
    assert should_start(sat) is True
    assert should_start(sat, skip_weekends=True) is False
    xmas = dt.date(2024, 12, 25)
    assert should_start(xmas, skip_holidays="AT") is False
    assert should_start(dt.date(2024, 12, 27), skip_holidays="AT") is True
    # first business day of Jan 2024 under AT calendar: Jan 1 is a holiday,
    # so Jan 2 is the first business date
    assert should_start(dt.date(2024, 1, 2), skip_for_first_business_date="AT") is True
    assert should_start(dt.date(2024, 1, 3), skip_for_first_business_date="AT") is False


def test_retry_until_success():
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("boom")

    fake_now = [dt.datetime(2024, 1, 1, 10, 0, 0)]

    def now():
        return fake_now[0]

    def sleep(s):
        fake_now[0] += dt.timedelta(seconds=s)

    rep = run_with_retry(flaky, RetryPolicy(retry_seconds=60, planned_until="1200"), now, sleep)
    assert rep.succeeded and rep.attempts == 3 and len(rep.errors) == 2


def test_retry_deadline():
    def always_fail():
        raise RuntimeError("nope")

    fake_now = [dt.datetime(2024, 1, 1, 11, 58, 0)]

    def now():
        return fake_now[0]

    def sleep(s):
        fake_now[0] += dt.timedelta(seconds=s)

    rep = run_with_retry(always_fail, RetryPolicy(retry_seconds=60, planned_until="1200"), now, sleep)
    assert not rep.succeeded
    # 11:58, 11:59 and the 12:00 boundary minute run; 12:01 would exceed
    assert rep.attempts == 3


def test_ledger(tmp_path):
    f1, f2 = tmp_path / "a.csv", tmp_path / "b.csv"
    f1.write_text("1")
    f2.write_text("2")
    led = ProcessedLedger(str(tmp_path / "ledger.jsonl"))
    assert sorted(led.unprocessed([str(f1), str(f2)])) == sorted([str(f1), str(f2)])
    led.mark([str(f1)])
    assert led.unprocessed([str(f1), str(f2)]) == [str(f2)]
    # reload from disk → state survives (idempotence across runs)
    led2 = ProcessedLedger(str(tmp_path / "ledger.jsonl"))
    assert led2.unprocessed([str(f1)]) == []
    # modified file counts as new again
    f1.write_text("1-changed")
    assert led2.unprocessed([str(f1)]) == [str(f1)]


def test_check_files(tmp_path):
    present = tmp_path / "ok.csv"
    present.write_text("x")
    missing = str(tmp_path / "gone.csv")
    assert check_files([str(present)]) == [str(present)]
    with pytest.raises(FileNotFoundError):
        check_files([str(present), missing])
    assert check_files([str(present), missing], optional={missing}) == [str(present)]


def test_run_report_shape():
    assert RunReport().attempts == 0


def test_sql_render_and_execs():
    from etl_wrap_spark.sql import render, sql_literal

    assert sql_literal(None) == "NULL"
    assert sql_literal("O'Brien") == "'O''Brien'"
    assert sql_literal(True) == "TRUE"
    assert render("DELETE FROM t WHERE d = :dt AND n > :n", {"dt": "2024-01-01", "n": 5}) == (
        "DELETE FROM t WHERE d = '2024-01-01' AND n > 5"
    )


def test_logcheck_frequency_rules():
    from etl_wrap_spark.plans.logcheck import LogCheck, due

    mk = lambda f: LogCheck("j", "x.log", "started", freq=f)  # noqa: E731
    tue = dt.datetime(2024, 1, 2, 9, 0)  # Tuesday Jan 2
    sat = dt.datetime(2024, 1, 6, 9, 0)
    newyear = dt.datetime(2024, 1, 1, 9, 0)  # AT holiday
    assert due(mk("B"), tue) and not due(mk("B"), sat) and not due(mk("B"), newyear)
    assert due(mk("D"), sat)
    assert due(mk("M1"), newyear) and not due(mk("M1"), tue)
    assert due(mk("Q"), tue) and not due(mk("Q"), dt.datetime(2024, 1, 1, 9, 0))
    assert due(mk("Q"), dt.datetime(2024, 4, 1, 9, 0))
    assert due(mk("ML"), dt.datetime(2024, 1, 31, 9, 0)) and not due(mk("ML"), tue)
    assert due(mk("W3"), tue) and not due(mk("W3"), sat)  # Tuesday = 3 (1=Sunday)
    # MW digit is first_week's 0=Sunday..6=Saturday (DateUtil.pm:194-207),
    # one less than the W digit: first Tuesday of Jan 2024 is MW2, not MW3.
    assert due(mk("MW2"), tue)  # first Tuesday of Jan 2024
    assert not due(mk("MW3"), tue)  # MW3 = first WEDNESDAY under first_week
    assert due(mk("MW3"), dt.datetime(2024, 1, 3, 9, 0))  # first Wednesday
    assert not due(mk("MW2"), dt.datetime(2024, 1, 9, 9, 0))  # second Tuesday
    late = LogCheck("j", "x.log", "p", freq="D", time_to_check="10:00:00")
    assert not due(late, dt.datetime(2024, 1, 2, 9, 59)) and due(late, dt.datetime(2024, 1, 2, 10, 1))


def test_logcheck_scan(tmp_path):
    from etl_wrap_spark.plans.logcheck import LogCheck, run_checks

    log = tmp_path / "job.log"
    log.write_text(
        "2024/01/02 09:00:01\tINFO\tjob started ok\n"
        "02.01.2024 09:05:00\tINFO\tgerman dialect line\n"
        "2024-01-01 09:00:00\tINFO\tyesterday started\n"
    )
    now = dt.datetime(2024, 1, 2, 12, 0)
    checks = [
        LogCheck("ok_job", str(log), "started ok", freq="D"),
        LogCheck("german", str(log), "german dialect", freq="D"),
        LogCheck("stale", str(log), "yesterday started", freq="D"),  # wrong date
        LogCheck("missing", str(tmp_path / "nope.log"), "x", freq="D"),
    ]
    res = {r.job: r for r in run_checks(checks, now)}
    assert res["ok_job"].ok and res["german"].ok
    assert not res["stale"].ok and not res["missing"].ok


def test_resolve_secrets():
    from etl_wrap_spark.plans.config import ConfigError, resolve_secrets

    cfg = {"DB": {"query": "x", "schemaName": "u={{ENV:ETLW_USER}};p={{ENV:ETLW_PW}}"}}
    out = resolve_secrets(cfg, {"ETLW_USER": "alice", "ETLW_PW": "s3c"})
    assert out["DB"]["schemaName"] == "u=alice;p=s3c"
    assert cfg["DB"]["schemaName"].startswith("u={{")  # input untouched
    with pytest.raises(ConfigError, match="ETLW_MISSING"):
        resolve_secrets({"a": {"b": "{{ENV:ETLW_MISSING}}"}}, {})


def test_upload_cmd():
    from etl_wrap_spark.connectors.upload_cmd import execute_upload_cmd

    ok = execute_upload_cmd(["python", "-c", "print('uploaded 3 files')"])
    assert ok.ok and ok.returncode == 0
    # exit 0 but error text in log → failure (log scraping wins)
    bad = execute_upload_cmd(["python", "-c", "print('transfer FAILED: timeout')"])
    assert not bad.ok and bad.matched_errors
    nonzero = execute_upload_cmd(["python", "-c", "import sys; sys.exit(3)"])
    assert not nonzero.ok and nonzero.returncode == 3


def test_upload_cmd_cleanup(tmp_path):
    from etl_wrap_spark.connectors.upload_cmd import execute_upload_cmd

    f = tmp_path / "payload.csv"
    f.write_text("x")
    execute_upload_cmd(["python", "-c", "print('done')"], cleanup_files=[str(f)])
    assert not f.exists()


def test_load_tables_scopes_parquet_confs(spark):
    """load_tables restores the caller's parquet reader confs after its
    reads — only the UTC timeZone pin (execution-time semantics) stays
    session-wide (round-4 ADVICE follow-up)."""
    from etl_wrap_spark.session import load_tables

    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    t = load_tables(spark, "/root/testdata/sf0.001", ["events", "region"])
    assert t["events"].count() > 0
    assert spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled") == "true"
    assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "false"
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
