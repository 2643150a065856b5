"""Simulated-outage test for bench.py's stale-fallback artifact (VERDICT r4
weak #1): a failed TPU device claim must degrade to the last-known-good
measurement flagged ``stale: true`` — never to ``value: 0.0`` — so a pool
outage cannot zero a round's perf record.  Pure JSON plumbing; no jax."""

import importlib.util
import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def bench():
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(REPO, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_under_test"] = mod
    spec.loader.exec_module(mod)
    yield mod
    del sys.modules["bench_under_test"]


def test_outage_emits_stale_lkg(bench, tmp_path, monkeypatch):
    lkg = tmp_path / "lkg.json"
    lkg.write_text(json.dumps({
        "record": {
            "metric": "train_step_iters_per_sec_100k_800x608",
            "value": 6.832,
            "unit": "iters/s",
            "vs_baseline": 0.683,
            "detail": {"n_gaussians": 100000},
        },
        "commit": "b2c2af5",
        "measured_at": "2026-08-16T00:00:00Z",
    }))
    monkeypatch.setenv("GS_BENCH_LKG_PATH", str(lkg))

    out = json.loads(bench._claim_failed_diag(600.0, attempts=3))
    assert out["value"] == 6.832, "stale fallback must carry the real number"
    assert out["vs_baseline"] == 0.683
    assert out["metric"] == "train_step_iters_per_sec_100k_800x608"
    d = out["detail"]
    assert d["stale"] is True
    assert d["commit"] == "b2c2af5"
    assert d["measured_at"] == "2026-08-16T00:00:00Z"
    assert "600s" in d["outage"] and "3 attempt(s)" in d["outage"]
    assert d["n_gaussians"] == 100000, "original detail is preserved"


def test_outage_without_lkg_is_explicit_zero(bench, tmp_path, monkeypatch):
    monkeypatch.setenv("GS_BENCH_LKG_PATH", str(tmp_path / "missing.json"))
    out = json.loads(bench._claim_failed_diag(600.0))
    assert out["value"] == 0.0
    assert "no fresh measurement possible" in out["detail"]["error"]


def test_corrupt_lkg_degrades_to_zero(bench, tmp_path, monkeypatch):
    bad = tmp_path / "bad.json"
    bad.write_text("{not json")
    monkeypatch.setenv("GS_BENCH_LKG_PATH", str(bad))
    out = json.loads(bench._claim_failed_diag(60.0))
    assert out["value"] == 0.0


def test_save_lkg_roundtrips(bench, tmp_path, monkeypatch):
    lkg = tmp_path / "lkg.json"
    monkeypatch.setenv("GS_BENCH_LKG_PATH", str(lkg))
    rec = {"metric": "m", "value": 9.5, "unit": "iters/s",
           "vs_baseline": 0.95, "detail": {}}
    bench._save_lkg(rec)
    saved = json.loads(lkg.read_text())
    assert saved["record"] == rec
    assert saved["measured_at"].endswith("Z")
    out = json.loads(bench._claim_failed_diag(600.0))
    assert out["value"] == 9.5
    assert out["detail"]["stale"] is True


def test_repo_lkg_seed_is_valid():
    """The committed seed (round-2 measurement) must parse and be nonzero so
    the very next outage already has a fallback."""
    with open(os.path.join(REPO, "bench_lkg.json")) as f:
        seed = json.load(f)
    assert seed["record"]["value"] > 0
    assert seed["commit"]


def test_smoke_outage_keeps_its_own_metric(bench, tmp_path, monkeypatch):
    """A --smoke claim failure must NOT re-emit the stale train-step record
    (a pass/fail gate is not a throughput); it reports its own metric."""
    lkg = tmp_path / "lkg.json"
    lkg.write_text(json.dumps({
        "record": {"metric": "train_step_iters_per_sec", "value": 6.8,
                   "unit": "iters/s", "vs_baseline": 0.68, "detail": {}},
        "commit": "x", "measured_at": "2026-08-16T00:00:00Z",
    }))
    monkeypatch.setenv("GS_BENCH_LKG_PATH", str(lkg))
    out = json.loads(bench._claim_failed_diag(600.0, smoke=True))
    assert out["metric"] == "tpu_kernel_smoke_pass"
    assert out["value"] == 0.0
    assert "error" in out["detail"]


def test_stale_fallback_requires_matching_config(bench, tmp_path, monkeypatch):
    """An A/B arm (different payload/size/knobs) must not inherit the
    headline config's stale number — config mismatch degrades to the
    explicit zero diagnostic."""
    lkg = tmp_path / "lkg.json"
    lkg.write_text(json.dumps({
        "record": {
            "metric": "train_step_iters_per_sec_100k_800x608",
            "value": 6.8, "unit": "iters/s", "vs_baseline": 0.68,
            "detail": {"n_gaussians": 100000, "payload_dtype": "bf16",
                       "pack_positions": False, "dssim_in_grad": False},
        },
        "commit": "x", "measured_at": "2026-08-16T00:00:00Z",
    }))
    monkeypatch.setenv("GS_BENCH_LKG_PATH", str(lkg))

    # same config -> stale record
    out = json.loads(bench._claim_failed_diag(600.0))
    assert out["value"] == 6.8 and out["detail"]["stale"] is True

    # different payload -> zero diagnostic
    monkeypatch.setenv("GS_BENCH_PAYLOAD", "f32")
    out = json.loads(bench._claim_failed_diag(600.0))
    assert out["value"] == 0.0
    monkeypatch.delenv("GS_BENCH_PAYLOAD")

    # different knob -> zero diagnostic
    monkeypatch.setenv("GS_BENCH_PACK_POS", "1")
    out = json.loads(bench._claim_failed_diag(600.0))
    assert out["value"] == 0.0
