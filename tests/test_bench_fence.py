"""The bench regression fence must (a) fire on a synthetic slowdown and
(b) fall back PAST an artifact whose machine-readable payload was lost
(BENCH_r03.json shipped with ``parsed: null`` — VERDICT r3 wrong #2 —
and the old fence silently no-opped against it)."""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

import bench  # noqa: E402


def test_load_prev_skips_null_parsed(tmp_path):
    (tmp_path / "BENCH_r01.json").write_text(
        json.dumps({"parsed": {"queries": {"q1": 1.0, "q2": 0.5}}}))
    (tmp_path / "BENCH_r02.json").write_text(
        json.dumps({"parsed": None, "tail": "truncated..."}))
    prev, name = bench._load_prev_queries(str(tmp_path))
    assert prev == {"q1": 1.0, "q2": 0.5}
    assert name == "BENCH_r01.json"


def test_load_prev_prefers_newest_usable(tmp_path):
    (tmp_path / "BENCH_r01.json").write_text(
        json.dumps({"parsed": {"queries": {"q1": 9.0}}}))
    (tmp_path / "BENCH_r03.json").write_text(
        json.dumps({"queries": {"q1": 1.0}}))  # top-level form, newest
    prev, name = bench._load_prev_queries(str(tmp_path))
    assert prev == {"q1": 1.0} and name == "BENCH_r03.json"


def test_load_prev_empty_dir(tmp_path):
    assert bench._load_prev_queries(str(tmp_path)) == ({}, "")


def test_load_prev_ignores_rounds_sidecar(tmp_path):
    """BENCH_rounds.json (the per-run detail sidecar bench.py itself
    writes) matches the BENCH_r*.json glob but is not a round artifact —
    it used to crash the int(...) sort key and kill the whole bench run
    before the scaling probe."""
    (tmp_path / "BENCH_rounds.json").write_text(
        json.dumps({"all_rounds": {"2": [], "8": []}}))
    assert bench._load_prev_queries(str(tmp_path)) == ({}, "")
    (tmp_path / "BENCH_r02.json").write_text(
        json.dumps({"parsed": {"queries": {"q1": 1.0}}}))
    prev, name = bench._load_prev_queries(str(tmp_path))
    assert prev == {"q1": 1.0} and name == "BENCH_r02.json"


def test_fence_fires_on_2x_slowdown():
    prev = {"q1": 1.0, "q2": 0.5}
    out = bench._regressions({"q1": 2.0, "q2": 0.51}, prev=prev,
                             baseline_name="BENCH_r01.json")
    assert set(out) == {"q1"}
    assert out["q1"]["ratio"] == 2.0
    assert out["q1"]["baseline"] == "BENCH_r01.json"


def test_fence_quiet_inside_threshold():
    prev = {"q1": 1.0}
    assert bench._regressions({"q1": 1.4}, prev=prev) == {}
    # unknown queries (new this round) never flag
    assert bench._regressions({"brand_new": 99.0}, prev=prev) == {}
