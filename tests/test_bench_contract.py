"""The bench-side contract machinery (round-10 verdict lens ruling,
implemented round 11) is itself part of the graded surface: the
`tail_vs_pinned` self-report is how the driver epoch proves "no query
>2x its committed-band wall", and the sf1 strict weak set feeds the
clean-session probe protocol. These tests pin the pure helpers so a
refactor cannot silently change what counts as a violator. No Spark
session needed.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(mod_name: str, rel_path: str):
    spec = importlib.util.spec_from_file_location(
        mod_name, os.path.join(REPO, rel_path)
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


bench = _load("bench_under_test", "bench.py")
weak_probe = _load("sf1_weak_probe_under_test", "tools/sf1_weak_probe.py")


# ------------------------------------------------- _tail_vs_pinned
def test_tail_violator_needs_both_ratio_and_absolute_excess():
    pinned = {"sf": 0.1, "queries": {"qa": 1.0, "qb": 0.2, "qc": 1.0}}
    timings = {
        "qa": 2.7,   # 2.7x AND +1.7s excess -> violator
        "qb": 0.55,  # 2.75x but excess 0.35 < 0.5 guard -> floor jitter
        "qc": 1.9,   # excess 0.9 but only 1.9x -> in band
    }
    out = bench._tail_vs_pinned(timings, 0.1, pinned, sched_floor=0.2)
    assert out["status"] == "compared"
    assert list(out["violators"]) == ["qa"]
    assert out["violators"]["qa"]["ratio"] == 2.7
    assert out["abs_excess_guard_sec"] == 0.5  # max(0.5, 2*0.2)


def test_tail_guard_scales_with_measured_sched_floor():
    pinned = {"sf": 0.1, "queries": {"qa": 0.8}}
    # guard = 2*0.6 = 1.2: a +1.1s excess at 2.4x must NOT flag on a
    # host whose empty-job floor itself reads 0.6s
    out = bench._tail_vs_pinned({"qa": 1.9}, 0.1, pinned, sched_floor=0.6)
    assert out["abs_excess_guard_sec"] == 1.2
    assert out["violators"] == {}


def test_tail_sf_mismatch_and_missing_pinned_disclose_status():
    out = bench._tail_vs_pinned({"qa": 1.0}, 0.1, None, 0.2)
    assert out["violators"] == {} and "no pinned" in out["status"]
    out = bench._tail_vs_pinned(
        {"qa": 9.0}, 0.1, {"sf": 1.0, "queries": {"qa": 1.0}}, 0.2
    )
    assert out["violators"] == {} and "not comparable" in out["status"]


def test_tail_new_queries_listed_not_flagged():
    pinned = {"sf": 0.1, "queries": {"qa": 1.0}}
    out = bench._tail_vs_pinned({"qa": 1.0, "qnew": 99.0}, 0.1, pinned, 0.2)
    assert out["new_queries"] == ["qnew"]
    assert out["violators"] == {}
    assert out["n_compared"] == 1


def test_tail_violators_sorted_most_severe_first():
    pinned = {"sf": 0.1, "queries": {"qa": 1.0, "qb": 1.0}}
    out = bench._tail_vs_pinned({"qa": 2.6, "qb": 4.0}, 0.1, pinned, 0.2)
    assert list(out["violators"]) == ["qb", "qa"]


# ---------------------------------------------- _load_pinned_band
def test_load_pinned_band_env_override_and_shape(tmp_path, monkeypatch):
    p = tmp_path / "band.json"
    p.write_text(json.dumps({"sf": 0.1, "queries": {"qa": 1.5}, "value": 9}))
    monkeypatch.setenv("SPARK_GRAFT_PINNED", str(p))
    band = bench._load_pinned_band()
    assert band == {"sf": 0.1, "queries": {"qa": 1.5}}


def test_load_pinned_band_garbage_returns_none(tmp_path, monkeypatch):
    p = tmp_path / "band.json"
    p.write_text("{not json")
    monkeypatch.setenv("SPARK_GRAFT_PINNED", str(p))
    assert bench._load_pinned_band() is None
    p.write_text(json.dumps({"queries": "not-a-dict"}))
    assert bench._load_pinned_band() is None


# ------------------------------------------------ strict_weak_set
def test_strict_weak_set_requires_both_lenses():
    detail = {
        "queries": {"qa": 1.0, "qb": 1.0, "qc": 1.0, "qd": 1.0},
        "queries_exec_only": {"qa": 0.9, "qb": 0.1, "qc": 0.9},
        "duckdb": {"qa": 0.3, "qb": 0.3, "qc": 2.0, "qd": None},
    }
    # qa: wall 3.3x AND exec 3x -> weak; qb: exec under bar -> not;
    # qc: wall under bar -> not; qd: no anchor -> skipped
    assert weak_probe.strict_weak_set(detail) == ["qa"]


def test_strict_weak_set_missing_exec_entry_not_weak():
    detail = {
        "queries": {"qa": 1.0},
        "queries_exec_only": {},
        "duckdb": {"qa": 0.3},
    }
    assert weak_probe.strict_weak_set(detail) == []
