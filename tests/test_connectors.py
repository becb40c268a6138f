"""Connector-policy tests via LocalTransport (no Spark, no network)."""

import datetime as dt
import os
import zipfile

import pytest

from etl_wrap_spark.connectors.transfer import (
    FetchResult,
    LocalTransport,
    SFTPTransport,
    archive_remote_files,
    extract_archives,
    fetch_files,
    move_to_history,
    remove_files_older_than,
    strip_redo_suffix,
    upload_file,
)


@pytest.fixture()
def remote(tmp_path):
    d = tmp_path / "remote"
    d.mkdir()
    (d / "data_a.csv").write_text("a")
    (d / "data_b.csv").write_text("b")
    (d / "other.txt").write_text("x")
    return d


def test_fetch_glob_and_optional(tmp_path, remote):
    local = tmp_path / "local"
    res = fetch_files(LocalTransport(), str(remote), str(local), ["data_*.csv", "missing.csv"], optional={"missing.csv"})
    assert isinstance(res, FetchResult)
    assert sorted(os.path.basename(p) for p in res.fetched) == ["data_a.csv", "data_b.csv"]
    assert res.missing == ["missing.csv"]
    with pytest.raises(FileNotFoundError):
        fetch_files(LocalTransport(), str(remote), str(local), ["required.csv"])


def test_extract_archives(tmp_path):
    z = tmp_path / "in.zip"
    with zipfile.ZipFile(z, "w") as zf:
        zf.writestr("inner/part1.csv", "1,2\n")
        zf.writestr("part2.csv", "3,4\n")
    plain = tmp_path / "plain.csv"
    plain.write_text("5,6\n")
    out = extract_archives([str(z), str(plain)], str(tmp_path))
    names = sorted(os.path.basename(p) for p in out)
    assert names == ["part1.csv", "part2.csv", "plain.csv"]
    assert (tmp_path / "part1.csv").read_text() == "1,2\n"


def test_upload_temp_rename(tmp_path, remote):
    src = tmp_path / "out.csv"
    src.write_text("data")
    final = upload_file(LocalTransport(), str(src), str(remote))
    assert os.path.basename(final) == "out.csv"
    assert (remote / "out.csv").read_text() == "data"
    assert not (remote / "temp.out.csv").exists()  # temp name renamed away


def test_archive_and_retention(tmp_path, remote):
    arch = tmp_path / "arch"
    arch.mkdir()
    archive_remote_files(
        LocalTransport(), str(remote), ["data_a.csv"], str(arch),
        timestamp=dt.datetime(2024, 1, 2, 3, 4, 5),
    )
    assert (arch / "data_a_20240102_030405.csv").exists()
    assert not (remote / "data_a.csv").exists()
    # retention: age one file artificially
    old = remote / "data_b.csv"
    os.utime(old, (1000000000, 1000000000))
    simulated = remove_files_older_than(LocalTransport(), str(remote), days=30, simulate=True)
    assert simulated == ["data_b.csv"] and old.exists()
    removed = remove_files_older_than(LocalTransport(), str(remote), days=30)
    assert removed == ["data_b.csv"] and not old.exists()


def test_redo_suffix_strip():
    assert strip_redo_suffix("load_20240102_030405.csv") == "load.csv"
    assert strip_redo_suffix("load_20240102030405.csv") == "load.csv"
    assert strip_redo_suffix("load_20240102.csv") == "load.csv"
    assert strip_redo_suffix("plain.csv") == "plain.csv"


def test_move_to_history_idempotent(tmp_path):
    f = tmp_path / "done.csv"
    f.write_text("x")
    hist = tmp_path / "hist"
    moved = move_to_history([str(f)], str(hist), timestamp=dt.datetime(2024, 5, 6, 7, 8, 9))
    assert [os.path.basename(m) for m in moved] == ["done_20240506_070809.csv"]
    # second call: file already gone → no error, nothing moved
    assert move_to_history([str(f)], str(hist)) == []


def test_sftp_gated_or_constructs():
    """Without paramiko: NotImplementedError with instructions. With it:
    construction succeeds lazily (no connection until first use)."""
    try:
        import paramiko  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError, match="paramiko"):
            SFTPTransport("host", "user")
    else:
        t = SFTPTransport("host", "user", password="pw")
        assert t._sftp is None  # lazy: nothing dialed yet
        t.close()


def test_sftp_integration(tmp_path):
    """Real SFTP round-trip (fetch/upload/rename/retention policies over
    SFTPTransport) — runs only where paramiko AND a local sshd test
    fixture exist; skipped in this environment."""
    pytest.importorskip("paramiko")
    pytest.skip("no sshd fixture in this environment")


# ----------------------------------------------------------------- mail
def test_mailer_throttles_and_reports():
    from etl_wrap_spark.plans.logcheck import CheckResult
    from etl_wrap_spark.plans.mail import MailConfig, Mailer
    from etl_wrap_spark.plans.runner import RunReport

    sent = []
    cfg = MailConfig(server="smtp.example.invalid", sender="etl@example.invalid",
                     to=["ops@example.invalid"], subject="ETL error", env="TEST")
    m = Mailer(cfg, send_fn=lambda _cfg, msg: sent.append(msg))

    # failed report → error mail with env-prefixed subject and context
    failed = RunReport(attempts=3, succeeded=False, errors=["boom", "still boom"])
    assert m.report(failed, context="load3") is True
    assert sent[-1]["Subject"] == "TEST: ETL error, load3"
    assert "boom" in sent[-1].get_content()
    # second error in the same run is throttled (MailFilter parity)
    assert m.error("load3", "another") is False and len(sent) == 1
    # new run: throttle re-arms
    m.reset()
    assert m.error("load3", "again") is True and len(sent) == 2

    # success-after-retry sends the all-clear; clean first-try success is silent
    m.reset()
    assert m.report(RunReport(attempts=2, succeeded=True, errors=["transient"])) is True
    assert "succeeded on attempt 2" in sent[-1].get_content()
    assert m.report(RunReport(attempts=1, succeeded=True)) is False

    # failed log checks → one summary mail
    m.reset()
    res = [CheckResult("jobA", True), CheckResult("jobB", False, "no entry")]
    assert m.check_results(res) is True
    assert "jobB" in sent[-1].get_content() and "jobA" not in sent[-1].get_content()
    assert m.check_results([CheckResult("jobA", True)]) is False
