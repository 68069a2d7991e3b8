"""bench.py contract tests (the driver runs it headlessly every round)."""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def test_reference_baseline_measures(torch):
    if not os.path.isdir("/root/reference"):
        pytest.skip("reference unavailable")
    fps = bench.bench_reference(batch=16, seconds=1.0)
    assert fps is not None and fps > 0


def test_main_prints_single_json_line(monkeypatch, capsys):
    monkeypatch.setenv("BENCH_E2E", "0")
    monkeypatch.setattr(bench, "bench_ours", lambda *a, **k: 12345.6)
    monkeypatch.setattr(bench, "bench_reference", lambda *a, **k: 10.0)
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    payload = json.loads(out[0])
    assert set(payload) == {"metric", "value", "unit", "vs_baseline"}
    assert payload["value"] == 12345.6
    assert payload["vs_baseline"] == pytest.approx(1234.56)
    assert payload["unit"] == "frames/sec"


def test_main_handles_missing_baseline(monkeypatch, capsys):
    monkeypatch.setenv("BENCH_E2E", "0")
    monkeypatch.setattr(bench, "bench_ours", lambda *a, **k: 100.0)
    monkeypatch.setattr(bench, "bench_reference", lambda *a, **k: None)
    bench.main()
    payload = json.loads(capsys.readouterr().out.strip())
    assert payload["vs_baseline"] is None


def test_main_includes_e2e_breakdown(monkeypatch, capsys):
    """With BENCH_E2E on, the single JSON line carries the end-to-end
    per-stage breakdown (VERDICT r1 item 3)."""
    monkeypatch.delenv("BENCH_E2E", raising=False)
    monkeypatch.setattr(bench, "bench_ours", lambda *a, **k: 100.0)
    monkeypatch.setattr(bench, "bench_reference", lambda *a, **k: 10.0)
    fake = {"frames": 10, "e2e_fps": 5.0, "decode_fps": 7.0,
            "transfer_fps": 9.0, "classify_fps": 100.0,
            "smooth_ms": 1.0, "csv_ms": 0.1, "overlap": {"efficiency": 1.0}}
    monkeypatch.setattr(bench, "bench_e2e", lambda *a, **k: fake)
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    payload = json.loads(out[0])
    assert payload["e2e"] == fake


def test_bench_e2e_real_tiny(monkeypatch, tmp_path):
    """bench_e2e end to end on a tiny clip (CPU), real measurement path."""
    monkeypatch.setenv("TMPDIR", str(tmp_path))
    import tempfile
    tempfile.tempdir = None  # pick up TMPDIR
    try:
        res = bench.bench_e2e("float32", frames=192, decode_workers=2)
    finally:
        tempfile.tempdir = None
    assert res["frames"] == 192
    for k in ("e2e_fps", "decode_fps", "transfer_fps", "classify_fps"):
        assert res[k] > 0
    assert set(res["overlap"]) == {"e2e_s", "serial_sum_s", "max_stage_s",
                                   "efficiency"}
