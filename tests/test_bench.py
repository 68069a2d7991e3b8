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
    monkeypatch.setattr(bench, "bench_ours", lambda *a, **k: 100.0)
    monkeypatch.setattr(bench, "bench_reference", lambda *a, **k: None)
    bench.main()
    payload = json.loads(capsys.readouterr().out.strip())
    assert payload["vs_baseline"] is None
