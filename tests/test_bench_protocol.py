"""The scaling protocol's control flow, pinned deterministically (no Ray):
`--scaling` auto mode must stop after ONE pair in a stable-canary ≥0.8
window, retry with per-leg MINIMA otherwise, and honor explicit
GRAFT_SCALE_REPEATS=N.  Co-tenant noise on this box is one-sided, so
min-of-N is the estimator the retry reports (BASELINE.md round 5)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402


@pytest.fixture
def stub(monkeypatch):
    """Stub the leg subprocess + canary; returns the call recorder."""
    calls = {"legs": [], "values": None}

    def fake_sub(cmd, env=None, capture_output=True, text=True, check=True):
        ncpu = int(env["RAY_GRAFT_CPUS"])
        calls["legs"].append(ncpu)
        v = calls["values"].pop(0)

        class R:
            stdout = json.dumps(
                {"value": v, "triples_per_sec": 1.0, "triples": 1})
        return R()

    monkeypatch.setattr(bench, "machine_canary", lambda: 3.0)
    monkeypatch.setattr(subprocess, "run", fake_sub)
    monkeypatch.delenv("GRAFT_SCALE_REPEATS", raising=False)
    return calls


def test_auto_stops_after_good_pair(stub):
    stub["values"] = [160.0, 46.0]          # eff 0.869, canaries stable
    out = bench.run_scaling()
    assert stub["legs"] == [4, 16]
    assert "repeats" not in out
    assert out["scaling_efficiency"] == 0.87
    assert out["canary_stable"] is True


def test_auto_retries_and_takes_minima(stub):
    stub["values"] = [100.0, 40.0, 90.0, 35.0]   # first pair eff 0.625
    out = bench.run_scaling()
    assert stub["legs"] == [4, 16, 4, 16]
    assert out["repeats"] == 2
    assert out["sec_4"] == 90.0 and out["sec_16"] == 35.0
    assert out["sec_4_samples"] == [100.0, 90.0]
    assert out["scaling_efficiency"] == round((90 / 35) / 4, 3)


def test_explicit_repeats_forced(stub, monkeypatch):
    monkeypatch.setenv("GRAFT_SCALE_REPEATS", "2")
    stub["values"] = [160.0, 46.0, 170.0, 50.0]  # good first pair anyway
    out = bench.run_scaling()
    assert stub["legs"] == [4, 16, 4, 16]        # no early stop when forced
    assert out["sec_4"] == 160.0 and out["sec_16"] == 46.0


def test_single_pair_mode(stub, monkeypatch):
    monkeypatch.setenv("GRAFT_SCALE_REPEATS", "1")
    stub["values"] = [100.0, 40.0]               # eff 0.625: no retry at N=1
    out = bench.run_scaling()
    assert stub["legs"] == [4, 16]
    assert "repeats" not in out


@pytest.fixture
def e2e_stub(monkeypatch):
    """Stub the e2e leg + canary for the plain-bench protocol; `values`
    feeds leg results, `canaries` feeds successive canary readings."""
    calls = {"legs": 0, "values": None, "canaries": None}

    def fake_leg():
        calls["legs"] += 1
        return {"metric": "kg_pipeline_e2e", "value": calls["values"].pop(0)}

    monkeypatch.setattr(bench, "_e2e_one", fake_leg)
    monkeypatch.setattr(bench, "machine_canary",
                        lambda: calls["canaries"].pop(0))
    monkeypatch.delenv("GRAFT_E2E_REPEATS", raising=False)
    return calls


def test_e2e_auto_single_leg_in_clean_window(e2e_stub):
    e2e_stub["values"] = [9.5]
    e2e_stub["canaries"] = [2.4, 2.5]            # stable, fast
    out = bench.run_e2e_protocol()
    assert e2e_stub["legs"] == 1
    assert out["value"] == 9.5
    assert out["canary_sec"] == [2.4, 2.5]
    assert "samples_sec" not in out


def test_e2e_auto_retries_on_slow_canaries(e2e_stub):
    e2e_stub["values"] = [21.0, 14.9]
    e2e_stub["canaries"] = [3.6, 3.4, 3.3]       # stable but SLOW window
    out = bench.run_e2e_protocol()
    assert e2e_stub["legs"] == 2
    assert out["value"] == 14.9                  # per-leg minimum
    assert out["samples_sec"] == [21.0, 14.9]


def test_e2e_auto_retries_on_unstable_canaries(e2e_stub):
    e2e_stub["values"] = [12.0, 12.5]
    e2e_stub["canaries"] = [2.4, 3.1, 2.5]       # >15% drift mid-run
    out = bench.run_e2e_protocol()
    assert e2e_stub["legs"] == 2
    assert out["value"] == 12.0                  # min keeps the first leg


def test_e2e_auto_retries_above_band(e2e_stub):
    e2e_stub["values"] = [14.0, 9.0]
    e2e_stub["canaries"] = [2.4, 2.5, 2.4]       # clean canaries, slow e2e
    out = bench.run_e2e_protocol()
    assert e2e_stub["legs"] == 2
    assert out["value"] == 9.0


def test_e2e_explicit_single(e2e_stub, monkeypatch):
    monkeypatch.setenv("GRAFT_E2E_REPEATS", "1")
    sentinel = {"metric": "kg_pipeline_e2e", "value": 7.0}
    monkeypatch.setattr(bench, "run_bench", lambda: dict(sentinel))
    out = bench.run_e2e_protocol()
    assert out == sentinel                       # raw run, no canaries
    assert e2e_stub["legs"] == 0


def test_e2e_explicit_repeats_forced(e2e_stub, monkeypatch):
    monkeypatch.setenv("GRAFT_E2E_REPEATS", "3")
    e2e_stub["values"] = [9.0, 8.5, 9.2]
    e2e_stub["canaries"] = [2.4, 2.4, 2.4, 2.4]  # clean — legs run anyway
    out = bench.run_e2e_protocol()
    assert e2e_stub["legs"] == 3
    assert out["value"] == 8.5
    assert out["samples_sec"] == [9.0, 8.5, 9.2]
