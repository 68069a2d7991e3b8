"""bench.py contract tests (the driver runs it headlessly every round)."""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


@pytest.fixture(autouse=True)
def _full_record_to_tmp(monkeypatch, tmp_path):
    """Keep each test's full-record file out of the repo root."""
    monkeypatch.setenv("BENCH_FULL_PATH", str(tmp_path / "bench_full.json"))
    # Committed full-game records must not leak into unit expectations.
    monkeypatch.setenv("BENCH_FULL_GAME", "0")
    yield


def _full_record():
    with open(os.environ["BENCH_FULL_PATH"]) as f:
        return json.load(f)


def test_reference_baseline_measures(torch):
    if not os.path.isdir("/root/reference"):
        pytest.skip("reference unavailable")
    fps = bench.bench_reference(batch=16, seconds=1.0)
    assert fps is not None and fps > 0


def test_main_prints_single_compact_json_line(monkeypatch, capsys):
    """stdout carries ONE compact line (VERDICT r4 #1: the round-4
    artifact lost the headline because the full blob outgrew the
    driver's 2,000-char tail); the full record goes to a file."""
    monkeypatch.setenv("BENCH_E2E", "0")
    monkeypatch.setattr(bench, "bench_ours", lambda *a, **k: 12345.6)
    monkeypatch.setattr(bench, "bench_reference", lambda *a, **k: 10.0)
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    assert len(out[0]) <= bench._COMPACT_LIMIT
    payload = json.loads(out[0])
    assert {"metric", "value", "unit", "vs_baseline",
            "roofline"} <= set(payload)
    assert payload["value"] == 12345.6
    assert payload["vs_baseline"] == pytest.approx(1234.56)
    assert payload["unit"] == "frames/sec"
    # The compact roofline keeps the judged fields; the full record
    # carries the whole derivation (terms, bytes/frame).
    assert payload["roofline"]["attained_fraction"] > 0
    full = _full_record()
    assert full["roofline"]["bytes_per_frame"] == sum(
        full["roofline"]["terms_bytes"].values())
    assert full["value"] == 12345.6


def test_main_handles_missing_baseline(monkeypatch, capsys):
    monkeypatch.setenv("BENCH_E2E", "0")
    monkeypatch.setattr(bench, "bench_ours", lambda *a, **k: 100.0)
    monkeypatch.setattr(bench, "bench_reference", lambda *a, **k: None)
    bench.main()
    payload = json.loads(capsys.readouterr().out.strip())
    assert payload["vs_baseline"] is None


def test_main_includes_e2e_breakdown(monkeypatch, capsys):
    """With BENCH_E2E on, the compact line summarizes the e2e block and
    the full record carries it verbatim (VERDICT r1 item 3 / r4 #1)."""
    monkeypatch.delenv("BENCH_E2E", raising=False)
    monkeypatch.setattr(bench, "bench_ours", lambda *a, **k: 100.0)
    monkeypatch.setattr(bench, "bench_reference", lambda *a, **k: 10.0)
    fake = {"frames": 10, "transfer": "bgr",
            "repeats": [{"e2e_fps": 5.0, "decode_fps": 7.0,
                         "transfer_fps": 9.0}],
            "median": {"classify_fps": 100.0},
            "overlap": {"efficiency": 0.4,
                        "per_repeat_efficiency": [0.4]},
            "efficiency_ceiling": 0.7,
            "sustained": {"frames": 30, "e2e_fps": 4.5},
            "projection_v5e8": {"seconds_per_3h_game": 95.1}}
    monkeypatch.setattr(bench, "bench_e2e", lambda *a, **k: fake)
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    payload = json.loads(out[0])
    e = payload["e2e"]
    assert e["e2e_fps"] == {"min": 5.0, "med": 5.0, "max": 5.0}
    assert e["efficiency"] == 0.4 and e["efficiency_ceiling"] == 0.7
    assert e["sustained"] == {"frames": 30, "e2e_fps": 4.5}
    assert e["proj_v5e8_s_per_game"] == 95.1
    assert _full_record()["e2e"] == fake


def test_compact_line_survives_fat_result():
    """A result the size of the round-4 blob (whose single line overgrew
    the capture) must compact to <= the limit WITHOUT losing the judged
    fields."""
    reps = [{"frames": 10000, "decode_s": 9.5, "transfer_s": 30.1,
             "e2e_s": 35.0, "smooth_ms": 0.3, "csv_ms": 0.3,
             "e2e_fps": 280.0 + i, "decode_fps": 1050.0 + i,
             "transfer_fps": 330.0 + i} for i in range(5)]
    result = {
        "metric": "frames/sec/chip, 256x144 uint8 -> classify "
                  "(prod net, uint8_chain)",
        "value": 122388.1, "unit": "frames/sec", "vs_baseline": 5828.0,
        "roofline": bench._roofline("uint8_chain", 122388.1),
        "e2e": {
            "frames": 10000, "transfer": "yuv420",
            "transfer_requested": "auto",
            "repeats": reps,
            "median": {"e2e_fps": 282.0, "decode_fps": 1052.0,
                       "transfer_fps": 332.0, "classify_fps": 123949.1,
                       "smooth_ms": 0.3, "csv_ms": 0.3},
            "overlap": {"e2e_s": 35.0, "serial_sum_s": 39.7,
                        "max_stage_s": 30.1, "efficiency": 0.45,
                        "per_repeat_efficiency": [0.4, 0.45, 0.5,
                                                  0.41, 0.48]},
            "host_cpu": {"note": "x" * 200, "host_cores": 1,
                         "decode_busy_frac": 1.0,
                         "transfer_busy_frac": 0.73},
            "efficiency_ceiling": 0.747,
            "decode_scaling": {"host_cores": 1, "points": [
                {"workers": w, "frames": 2560, "fps": 600.0}
                for w in (1, 2, 4)],
                "total_vs_1worker": [1.0, 0.9, 0.7],
                "coordination_factor": 0.7},
            "projection_v5e8": {"assumptions": "y" * 300,
                                "seconds_per_3h_game": 95.1,
                                "bottleneck_fps": 3409.0},
            "other_transfer_mode": {"transfer": "bgr",
                                    "csv_equal_to_headline": False,
                                    "e2e_fps": 286.0,
                                    "decode_fps": 1044.0,
                                    "transfer_fps": 331.0,
                                    "efficiency": 0.1},
            "sustained": {"frames": 30000, "e2e_s": 112.7,
                          "e2e_fps": 266.3, "segments": 67},
            "truncated": False,
        },
        "full_game": {"frames": 330000, "e2e_s": 800.0, "fps": 412.0,
                      "transfer": "yuv420", "windows_flat": True,
                      "source": "committed record docs/FULL_GAME.json"},
        "degraded": {"requested": "uint8_chain", "measured": "uint8_chain",
                     "failures": [{"stage": "e2e-warmup", "attempt": 1,
                                   "error": "E" * 300}] * 8},
    }
    line = bench._fit_compact(bench._compact_summary(result, "bench_full.json"))
    assert len(line) <= bench._COMPACT_LIMIT
    payload = json.loads(line)
    # Everything the judge checks survives compaction:
    assert payload["value"] == 122388.1
    assert payload["vs_baseline"] == 5828.0
    assert payload["roofline"]["attained_fraction"] > 0
    e = payload["e2e"]
    assert e["e2e_fps"]["med"] == 282.0
    assert e["efficiency"] == 0.45 and e["efficiency_ceiling"] == 0.747
    assert e["sustained"]["e2e_fps"] == 266.3
    assert e["proj_v5e8_s_per_game"] == 95.1
    assert e["transfer"] == "yuv420"
    assert e["transfer_requested"] == "auto"
    assert payload["full_game"]["fps"] == 412.0
    assert payload["degraded"]["requested"] == "uint8_chain"
    assert payload["full_record"] == "bench_full.json"


def test_full_game_record_reads_committed_file(monkeypatch, tmp_path):
    rec = {"frames": 330000, "e2e_s": 800.0, "fps": 412.0,
           "transfer": "yuv420"}
    p = tmp_path / "FULL_GAME.json"
    p.write_text(json.dumps(rec))
    monkeypatch.setenv("BENCH_FULL_GAME", "1")
    monkeypatch.setenv("BENCH_FULL_GAME_PATH", str(p))
    got = bench._full_game_record()
    assert got["fps"] == 412.0
    assert "committed record" in got["source"]
    monkeypatch.setenv("BENCH_FULL_GAME", "0")
    assert bench._full_game_record() is None
    monkeypatch.setenv("BENCH_FULL_GAME", "1")
    monkeypatch.setenv("BENCH_FULL_GAME_PATH", str(tmp_path / "absent"))
    assert bench._full_game_record() is None


def test_bench_e2e_real_tiny(monkeypatch, tmp_path):
    """bench_e2e end to end on a tiny clip (CPU), real measurement path,
    with repeats (VERDICT r2 item 4) and the sustained long-clip run."""
    import time

    monkeypatch.setenv("TMPDIR", str(tmp_path))
    # The transfer-mode A/B adds a second warmup+repeat; covered by
    # test_bench_e2e_transfer_compare instead so this stays fast.
    monkeypatch.setenv("BENCH_E2E_COMPARE", "0")
    monkeypatch.setattr(bench, "_START", time.monotonic())  # fresh budget
    import tempfile
    tempfile.tempdir = None  # pick up TMPDIR
    degraded = []
    try:
        res = bench.bench_e2e("float32", frames=192, decode_workers=2,
                              repeats=2, classify_fps=1000.0,
                              degraded=degraded, sustained_frames=384)
    finally:
        tempfile.tempdir = None
    assert res["frames"] == 192
    assert res["transfer"] == "bgr"
    assert len(res["repeats"]) == 2
    for k in ("e2e_fps", "decode_fps", "transfer_fps", "classify_fps"):
        assert res["median"][k] > 0
    assert set(res["overlap"]) - {"drift"} == {
        "e2e_s", "serial_sum_s", "max_stage_s",
        "efficiency", "per_repeat_efficiency"}
    assert len(res["overlap"]["per_repeat_efficiency"]) == len(res["repeats"])
    # The headline efficiency is clamped to the physical ceiling; a raw
    # median above it (host drift) moves to the optional "drift" field.
    assert res["overlap"]["efficiency"] <= 1.0
    if "drift" in res["overlap"]:
        assert res["overlap"]["drift"] > 1.0
    # The aggregate uses best-observed stage times vs median e2e: with
    # consistent stage rates it can't exceed a per-repeat ceiling by
    # construction (serial from minima is a lower bound on serial time).
    assert res["overlap"]["serial_sum_s"] <= min(
        r["decode_s"] + r["transfer_s"] for r in res["repeats"]) + 1.0
    assert res["sustained"]["frames"] == 384
    assert res["sustained"]["e2e_fps"] > 0
    proj = res["projection_v5e8"]
    assert proj["bottleneck_fps"] > 0 and proj["seconds_per_3h_game"] > 0
    # VERDICT r3 #4: the projection cites MEASURED decode-scaling points.
    sc = res["decode_scaling"]
    assert [p["workers"] for p in sc["points"]] == [1, 2, 4]
    assert all(p["fps"] > 0 for p in sc["points"])
    # VERDICT r4 #3: steady/cold rates split, startup measured per point.
    assert all(p["cold_fps"] > 0 and p["startup_s"] >= 0
               for p in sc["points"])
    assert sc["backend"] == "cv2"
    assert 0 < sc["coordination_factor"] <= 1.0
    assert proj["measured_per_core_decode_fps"] == sc["points"][0]["fps"]
    assert proj["measured_coordination_factor"] == sc["coordination_factor"]
    # VERDICT r4 #3: the stage pass and the scaling block reconcile in
    # the same artifact.
    rec = res["decode_reconciliation"]
    assert rec["scaling_1worker_steady_fps"] == sc["points"][0]["fps"]
    assert rec["ratio"] > 0
    # VERDICT r4 #7: host-CPU-grounded e2e floor (when /proc/stat is
    # available, which it is on this CI host).
    if res.get("host_cpu") is not None:
        fl = res["e2e_floor"]
        assert fl["floor_s"] > 0
        assert fl["median_e2e_s"] == res["overlap"]["e2e_s"]
    assert res["truncated"] is False


def test_bench_e2e_transfer_compare(monkeypatch, tmp_path):
    """The e2e block carries a one-repeat comparison in the OTHER
    transfer mode (VERDICT r3 #3: the 1.5 B/px yuv420 numbers must sit
    next to the BGR numbers in the artifact)."""
    import time

    from cut_detection_tpu.data import native_video

    if not native_video.yuv_available():
        pytest.skip("native decoder without YUV entry points")
    monkeypatch.setenv("TMPDIR", str(tmp_path))
    monkeypatch.setattr(bench, "_START", time.monotonic())
    import tempfile
    tempfile.tempdir = None
    try:
        res = bench.bench_e2e("float32", frames=192, decode_workers=1,
                              repeats=1, classify_fps=1000.0,
                              degraded=[], sustained_frames=0)
    finally:
        tempfile.tempdir = None
    other = res["other_transfer_mode"]
    assert other["transfer"] == "yuv420"
    assert "error" not in other, other
    assert other["transfer_fps"] > 0 and other["e2e_fps"] > 0
    assert isinstance(other["csv_equal_to_headline"], bool)
    assert isinstance(other["efficiency"], float)
    # 1.5 B/px vs 3 B/px: the yuv stage uploads half the bytes.  (Rates
    # drift on a busy host, so assert the byte count, not the seconds.)
    from cut_detection_tpu.ops.yuv import yuv420_nbytes

    assert yuv420_nbytes(144, 256) * 2 == 144 * 256 * 3


def test_headline_efficiency_clamps_drift():
    """An above-1 raw median (host drift) clamps to 1.0 with the raw
    value preserved in drift; a physical median passes through."""
    assert bench._headline_efficiency([0.4, 0.5, 0.6]) == (0.5, None)
    eff, drift = bench._headline_efficiency([0.455, 1.76, 1.535])
    assert eff == 1.0 and drift == 1.535
    # Boundary: exactly 1.0 is physical, not drift.
    assert bench._headline_efficiency([1.0, 1.0, 1.0]) == (1.0, None)


def test_headline_efficiency_barely_above_one_omits_drift():
    """A raw median that ROUNDS to 1.0 clamps without emitting a drift
    field (consumers assert drift > 1 strictly)."""
    assert bench._headline_efficiency([1.0004, 1.0004, 1.0004]) == (1.0, None)


def test_roofline_derivation():
    """The roofline field carries an auditable derivation: terms sum to
    bytes_per_frame, SoL = peak BW / bytes, fraction = attained / SoL."""
    roof = bench._roofline("uint8_chain", 122388.0)
    assert roof["bytes_per_frame"] == sum(roof["terms_bytes"].values())
    # uint8_chain stores every activation at 1 B: input read 110,592 +
    # layer-1 conv round trip 2*144*256*48 dominates.
    assert roof["terms_bytes"]["input_read"] == 144 * 256 * 3
    assert roof["terms_bytes"]["l1_conv_out_wr"] == 2 * 144 * 256 * 48
    sol = roof["peak_hbm_GBps"] * 1e9 / roof["bytes_per_frame"]
    assert abs(roof["speed_of_light_fps"] - round(sol)) <= 1
    assert abs(roof["attained_fraction"] - 122388.0 / sol) < 1e-3
    assert 0 < roof["attained_fraction"] < 1
    # bf16_full moves 2x the activation bytes -> lower SoL.
    roof16 = bench._roofline("bfloat16_full", 81153.0)
    assert roof16["bytes_per_frame"] > roof["bytes_per_frame"]
    # Unknown rung / no measurement -> no field.
    assert bench._roofline("weird", 1.0) is None
    assert bench._roofline("uint8_chain", None) is None


def test_retry_recovers_from_transient_failure(monkeypatch):
    """A failing first attempt (the BENCH_r02 failure mode) retries and
    succeeds; the failure is recorded for the degraded field."""
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("FAILED_PRECONDITION: TPU backend error")
        return 42.0

    monkeypatch.setenv("BENCH_BACKOFF", "0")
    record = []
    assert bench._retry(flaky, "classify[test]", record=record) == 42.0
    assert calls["n"] == 2
    assert len(record) == 1
    assert "FAILED_PRECONDITION" in record[0]["error"]


def test_retry_exhausts_and_raises(monkeypatch):
    monkeypatch.setenv("BENCH_BACKOFF", "0")
    record = []

    def always_fail():
        raise RuntimeError("UNAVAILABLE: boom")

    with pytest.raises(RuntimeError):
        bench._retry(always_fail, "x", attempts=3, record=record)
    assert len(record) == 3


def test_main_survives_failing_first_attempt(monkeypatch, capsys):
    """main() emits the JSON line even when the first hardware attempt
    dies with a relay fault — the round-2 scoreboard failure mode."""
    monkeypatch.setenv("BENCH_E2E", "0")
    monkeypatch.setenv("BENCH_BACKOFF", "0")
    calls = {"n": 0}

    def flaky(*a, **k):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("FAILED_PRECONDITION: TPU backend error")
        return 120000.0

    monkeypatch.setattr(bench, "bench_ours", flaky)
    monkeypatch.setattr(bench, "bench_reference", lambda *a, **k: 40.0)
    bench.main()
    payload = json.loads(capsys.readouterr().out.strip())
    assert payload["value"] == 120000.0
    assert payload["degraded"]["measured"] == "uint8_chain"
    assert payload["degraded"]["failures"][0]["attempt"] == 1


def test_main_falls_back_down_precision_ladder(monkeypatch, capsys):
    """If one rung keeps failing, the next rung is measured and the JSON
    line records the degradation instead of crashing."""
    monkeypatch.setenv("BENCH_E2E", "0")
    monkeypatch.setenv("BENCH_BACKOFF", "0")
    monkeypatch.setenv("BENCH_RETRIES", "2")

    def by_precision(*a, precision=None, **k):
        if precision in ("uint8_chain", "uint8_pool"):
            raise RuntimeError("UNAVAILABLE: relay wedged")
        return 80000.0

    monkeypatch.setattr(bench, "bench_ours", by_precision)
    monkeypatch.setattr(bench, "bench_reference", lambda *a, **k: 40.0)
    bench.main()
    payload = json.loads(capsys.readouterr().out.strip())
    assert payload["value"] == 80000.0
    assert "bfloat16_full" in payload["metric"]
    assert payload["degraded"]["requested"] == "uint8_chain"
    assert payload["degraded"]["measured"] == "bfloat16_full"


def test_main_total_failure_still_emits_json(monkeypatch, capsys):
    monkeypatch.setenv("BENCH_E2E", "0")
    monkeypatch.setenv("BENCH_BACKOFF", "0")
    monkeypatch.setenv("BENCH_RETRIES", "1")

    def always_fail(*a, **k):
        raise RuntimeError("dead chip")

    monkeypatch.setattr(bench, "bench_ours", always_fail)
    # Pin the CPU fallback off: this test covers the everything-failed
    # diagnostic line (the fallback's own tests live above).
    monkeypatch.setattr(bench, "_cpu_fallback",
                        lambda req, parent_failures=None: (None, 1))
    with pytest.raises(SystemExit) as ei:
        bench.main()
    assert ei.value.code == 1
    payload = json.loads(capsys.readouterr().out.strip())
    assert payload["value"] is None
    # Same schema as partial degradation: {requested, measured, failures}.
    assert payload["degraded"]["requested"] == "uint8_chain"
    assert payload["degraded"]["measured"] is None
    assert len(payload["degraded"]["failures"]) == 4  # one per ladder rung


def test_retry_with_zero_attempts_still_runs_once(monkeypatch):
    """BENCH_RETRIES=0 means one attempt, not `raise None` from an
    empty loop."""
    monkeypatch.setenv("BENCH_BACKOFF", "0")
    assert bench._retry(lambda: 42, "x", attempts=0) == 42
    with pytest.raises(RuntimeError, match="boom"):
        bench._retry(lambda: (_ for _ in ()).throw(RuntimeError("boom")),
                     "x", attempts=0)


def test_e2e_fault_surfaces_in_degraded_even_with_clean_headline(
        monkeypatch, capsys):
    """A retried e2e failure must appear in the JSON degraded field even
    when the headline classify measured with zero failures."""
    monkeypatch.setenv("BENCH_E2E", "1")
    monkeypatch.setenv("BENCH_BACKOFF", "0")
    monkeypatch.setattr(bench, "bench_ours", lambda *a, **k: 120000.0)
    monkeypatch.setattr(bench, "bench_reference", lambda *a, **k: 40.0)

    def fake_e2e(precision, *, degraded, **k):
        degraded.append({"stage": "e2e-warmup", "attempt": 1,
                         "error": "FAILED_PRECONDITION: relay"})
        return {"frames": 1}

    monkeypatch.setattr(bench, "bench_e2e", fake_e2e)
    bench.main()
    payload = json.loads(capsys.readouterr().out.strip())
    assert payload["value"] == 120000.0
    assert payload["degraded"]["failures"][0]["stage"] == "e2e-warmup"


def test_retry_fails_fast_on_deterministic_error(monkeypatch):
    """Errors with no transient marker (bad checkpoint, shape mismatch)
    must not burn the backoff budget — one attempt, then the ladder
    falls back."""
    monkeypatch.setenv("BENCH_BACKOFF", "9999")  # would hang if slept
    record = []
    calls = {"n": 0}

    def broken():
        calls["n"] += 1
        raise ValueError("shape mismatch: got (3,) want (4,)")

    with pytest.raises(ValueError):
        bench._retry(broken, "x", attempts=4, record=record)
    assert calls["n"] == 1
    assert len(record) == 1

    # Transient markers still retry (immediately, with zero backoff).
    monkeypatch.setenv("BENCH_BACKOFF", "0")
    calls["n"] = 0

    def wedged():
        calls["n"] += 1
        raise RuntimeError("UNAVAILABLE: relay wedged")

    with pytest.raises(RuntimeError):
        bench._retry(wedged, "x", attempts=3)
    assert calls["n"] == 3


def test_malformed_backoff_env_does_not_crash(monkeypatch):
    """A bad BENCH_BACKOFF (empty / non-numeric) must not take down the
    crash-proof bench before the first attempt — the default schedule
    applies instead and fn() still runs."""
    for bad in ("", "abc", ",,"):
        monkeypatch.setenv("BENCH_BACKOFF", bad)
        assert bench._retry(lambda: 42, "x", attempts=2) == 42

    # And with a transient failure: still retries (schedule defaulted,
    # not crashed) — budget the sleep away via the cumulative cap.
    monkeypatch.setenv("BENCH_BACKOFF", "abc")
    monkeypatch.setattr(bench, "_SLEPT", [bench._budget()])
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        raise RuntimeError("UNAVAILABLE: boom")

    with pytest.raises(RuntimeError):
        bench._retry(flaky, "x", attempts=3)
    assert calls["n"] == 1  # cap stopped the (defaulted) 20s sleep


def test_cumulative_retry_sleep_cap(monkeypatch):
    """Broad transient markers can misclassify a deterministic error;
    the cumulative sleep cap (25% of budget) bounds the damage across
    rungs instead of letting each one ride the full backoff."""
    monkeypatch.setenv("BENCH_BACKOFF", "0.01")
    monkeypatch.setattr(bench, "_SLEPT", [0.0])
    calls = {"n": 0}

    def wedged():
        calls["n"] += 1
        raise RuntimeError("INTERNAL: looks transient, is not")

    with pytest.raises(RuntimeError):
        bench._retry(wedged, "x", attempts=3)
    assert calls["n"] == 3  # under the cap: all attempts ran
    assert bench._SLEPT[0] > 0

    # Once the cap is consumed, later rungs stop retrying immediately.
    monkeypatch.setattr(bench, "_SLEPT", [0.25 * bench._budget()])
    calls["n"] = 0
    with pytest.raises(RuntimeError):
        bench._retry(wedged, "y", attempts=3)
    assert calls["n"] == 1


def test_backend_init_timeout_emits_json(monkeypatch, capsys):
    """A hung backend init (wedged tunnel makes jax.devices() block
    forever, raising nothing) must still produce the diagnostic JSON
    line instead of a killed process with no output."""
    monkeypatch.setattr(bench, "_backend_init_with_timeout",
                        lambda t: (None, "no devices within 1s"))
    # The CPU fallback fires first now; this test pins the both-failed
    # path (fallback child also produced nothing).
    monkeypatch.setattr(bench, "_cpu_fallback",
                        lambda req, parent_failures=None: (None, 1))
    with pytest.raises(SystemExit) as ei:
        bench.main()
    assert ei.value.code == 1
    payload = json.loads(capsys.readouterr().out.strip())
    assert payload["value"] is None
    assert payload["degraded"]["failures"][0]["stage"] == "backend-init"


def test_bounded_passes_value_and_exceptions(monkeypatch):
    assert bench._bounded(lambda: 42, "x") == 42
    with pytest.raises(ValueError, match="boom"):
        bench._bounded(lambda: (_ for _ in ()).throw(ValueError("boom")),
                       "x")


def test_bounded_times_out_hung_stage(monkeypatch):
    """A stage that HANGS (the wedged-tunnel failure mode: no exception,
    no return) surfaces as a DEADLINE TimeoutError so the retry/ladder
    machinery engages instead of the bench stalling forever."""
    import time

    t0 = time.monotonic()
    with pytest.raises(TimeoutError, match="DEADLINE"):
        bench._bounded(lambda: time.sleep(300), "hung", timeout=0.2)
    assert time.monotonic() - t0 < 30  # explicit timeout respected

    # The DEADLINE marker classifies as transient, so _retry backs off
    # on it rather than failing fast.
    assert bench._is_transient("DEADLINE: classify still running")


def test_hung_measurement_falls_down_ladder_to_cpu(monkeypatch, capsys):
    """main(): every rung hangs -> _bounded times out each -> the CPU
    fallback's line is relayed with rc=0 (the full wedged-tunnel
    story, end to end)."""
    import time as _time

    monkeypatch.setenv("BENCH_E2E", "0")
    monkeypatch.setenv("BENCH_BACKOFF", "0")
    monkeypatch.setenv("BENCH_RETRIES", "1")
    monkeypatch.setattr(bench, "_bounded",
                        lambda fn, what, timeout=None: (_ for _ in ()).throw(
                            TimeoutError(f"DEADLINE: {what} wedged")))
    monkeypatch.setattr(bench, "_cpu_fallback",
                        lambda req, parent_failures=None: ('{"value": 11.0}', 0))
    with pytest.raises(SystemExit) as ei:
        bench.main()
    assert ei.value.code == 0
    assert json.loads(capsys.readouterr().out.strip())["value"] == 11.0


def test_cpu_fallback_subprocess_env(monkeypatch):
    """_cpu_fallback strips the axon sitecustomize, pins the CPU
    platform, shrinks the flagship knobs, and returns the child's final
    JSON line."""
    import subprocess

    captured = {}

    def fake_run(cmd, *, env, **kw):
        captured["cmd"] = cmd
        captured["env"] = env

        class P:
            stdout = 'noise\n{"value": 7.0}\n'
            returncode = 0
        return P()

    monkeypatch.setenv("PYTHONPATH", "/root/.axon_site:/elsewhere")
    monkeypatch.delenv("CUTDET_BENCH_FORCE_CPU", raising=False)
    monkeypatch.setattr(subprocess, "run", fake_run)
    line, rc = bench._cpu_fallback("uint8_chain")
    assert rc == 0 and json.loads(line)["value"] == 7.0
    env = captured["env"]
    assert env["JAX_PLATFORMS"] == "cpu"
    assert env["CUTDET_BENCH_FORCE_CPU"] == "1"
    assert env["CUTDET_BENCH_REQUESTED"] == "uint8_chain"
    assert env["BENCH_PRECISION"] == "float32"
    assert ".axon_site" not in env["PYTHONPATH"]
    assert "/elsewhere" in env["PYTHONPATH"]
    assert captured["cmd"][0] == sys.executable


def test_cpu_fallback_keeps_non_sitecustomize_axon_paths(monkeypatch):
    """The PYTHONPATH filter drops the axon sitecustomize dir, not every
    entry containing the letters 'axon'."""
    import subprocess

    captured = {}

    def fake_run(cmd, *, env, **kw):
        captured["env"] = env

        class P:
            stdout = '{"value": 1.0}\n'
            returncode = 0
        return P()

    monkeypatch.setenv("PYTHONPATH",
                       "/root/.axon_site:/home/jaxon/libs:/opt/axon_site/")
    monkeypatch.delenv("CUTDET_BENCH_FORCE_CPU", raising=False)
    monkeypatch.setattr(subprocess, "run", fake_run)
    bench._cpu_fallback("uint8_chain")
    parts = captured["env"]["PYTHONPATH"].split(":")
    assert "/home/jaxon/libs" in parts
    assert "/root/.axon_site" not in parts
    assert "/opt/axon_site/" not in parts


def test_cpu_fallback_rejects_child_null_line(monkeypatch):
    """A fallback child that measured nothing (value: null) must not
    shadow the parent's richer diagnostic — the fallback reports
    failure instead of relaying the child's line."""
    import subprocess

    def fake_run(cmd, **kw):
        class P:
            stdout = '{"value": null, "degraded": {"measured": null}}\n'
            returncode = 1
        return P()

    monkeypatch.delenv("CUTDET_BENCH_FORCE_CPU", raising=False)
    monkeypatch.setattr(subprocess, "run", fake_run)
    assert bench._cpu_fallback("uint8_chain") == (None, 1)


def test_cpu_fallback_merges_parent_failures(monkeypatch):
    """A successful fallback child must not ERASE the parent's TPU
    failure records: the artifact should say why the chip path failed,
    not just that a CPU number replaced it."""
    import subprocess

    def fake_run(cmd, **kw):
        class P:
            stdout = ('{"value": 9.0, "degraded": {"platform": "cpu", '
                      '"failures": [{"stage": "classify[float32]", '
                      '"attempt": 1, "error": "child-side"}]}}\n')
            returncode = 0
        return P()

    monkeypatch.delenv("CUTDET_BENCH_FORCE_CPU", raising=False)
    monkeypatch.setattr(subprocess, "run", fake_run)
    parent = [{"stage": "backend-init", "attempt": 1,
               "error": "no devices within 60s"}]
    line, rc = bench._cpu_fallback("uint8_chain", parent_failures=parent)
    assert rc == 0
    payload = json.loads(line)
    failures = payload["degraded"]["failures"]
    assert failures[0]["stage"] == "backend-init"  # parent's record first
    assert failures[1]["error"] == "child-side"  # child's kept
    assert payload["degraded"]["platform"] == "cpu"


def test_backend_init_raise_triggers_cpu_fallback(monkeypatch, capsys):
    """A backend init that RAISES (relay fault surfacing as an exception
    instead of a hang) must land on the same fallback + diagnostic path,
    never a raw traceback with no JSON line."""
    def raising_init(default_timeout):
        raise RuntimeError("Unable to initialize backend 'axon'")

    monkeypatch.setattr(
        "cut_detection_tpu.utils.platform.init_devices", raising_init)
    captured = {}

    def fake_fallback(req, parent_failures=None):
        captured["failures"] = list(parent_failures or [])
        return None, 1

    monkeypatch.setattr(bench, "_cpu_fallback", fake_fallback)
    with pytest.raises(SystemExit) as ei:
        bench.main()
    assert ei.value.code == 1
    payload = json.loads(capsys.readouterr().out.strip())
    assert payload["value"] is None
    rec = payload["degraded"]["failures"][0]
    assert rec["stage"] == "backend-init"
    assert "Unable to initialize backend" in rec["error"]
    # The fallback saw the same record (it merges into a child's line).
    assert captured["failures"] and captured["failures"][0] == rec


def test_cpu_fallback_never_recurses(monkeypatch):
    monkeypatch.setenv("CUTDET_BENCH_FORCE_CPU", "1")
    assert bench._cpu_fallback("uint8_chain") == (None, 1)


def test_cpu_fallback_can_be_disabled(monkeypatch):
    monkeypatch.delenv("CUTDET_BENCH_FORCE_CPU", raising=False)
    monkeypatch.setenv("BENCH_CPU_FALLBACK", "0")
    assert bench._cpu_fallback("uint8_chain") == (None, 1)


def test_backend_init_hang_triggers_cpu_fallback(monkeypatch, capsys):
    """A hung backend init now re-runs on the host CPU and relays the
    child's JSON line with rc=0 instead of recording value: null."""
    monkeypatch.setattr(bench, "_backend_init_with_timeout",
                        lambda t: (None, "no devices within 1s"))
    monkeypatch.setattr(
        bench, "_cpu_fallback",
        lambda req, parent_failures=None: (
            '{"value": 9.0, "degraded": {"platform": "cpu"}}', 0))
    with pytest.raises(SystemExit) as ei:
        bench.main()
    assert ei.value.code == 0
    payload = json.loads(capsys.readouterr().out.strip())
    assert payload["degraded"]["platform"] == "cpu"


def test_all_rungs_failed_triggers_cpu_fallback(monkeypatch, capsys):
    monkeypatch.setenv("BENCH_E2E", "0")
    monkeypatch.setenv("BENCH_BACKOFF", "0")
    monkeypatch.setenv("BENCH_RETRIES", "1")

    def always_fail(*a, **k):
        raise RuntimeError("UNAVAILABLE: relay wedged")

    monkeypatch.setattr(bench, "bench_ours", always_fail)
    monkeypatch.setattr(bench, "_cpu_fallback",
                        lambda req, parent_failures=None: ('{"value": 9.0}', 0))
    with pytest.raises(SystemExit) as ei:
        bench.main()
    assert ei.value.code == 0
    assert json.loads(capsys.readouterr().out.strip())["value"] == 9.0


def test_child_mode_marks_degraded_platform(monkeypatch, capsys):
    """In fallback-child mode the JSON line is unmistakably a host-CPU
    number: degraded.platform=cpu plus the original requested rung."""
    monkeypatch.setenv("BENCH_E2E", "0")
    monkeypatch.setenv("CUTDET_BENCH_FORCE_CPU", "1")
    monkeypatch.setenv("CUTDET_BENCH_REQUESTED", "uint8_chain")
    monkeypatch.setenv("BENCH_PRECISION", "float32")
    monkeypatch.setattr(bench, "bench_ours", lambda *a, **k: 500.0)
    monkeypatch.setattr(bench, "bench_reference", lambda *a, **k: 40.0)
    bench.main()
    payload = json.loads(capsys.readouterr().out.strip())
    assert payload["value"] == 500.0
    assert payload["degraded"]["platform"] == "cpu"
    assert payload["degraded"]["requested"] == "uint8_chain"
    assert "not a chip number" in payload["degraded"]["note"]


def test_backend_init_with_timeout_completes():
    # On the (forced-CPU) test backend init completes well inside the
    # bound and the device list is returned.
    devices, err = bench._backend_init_with_timeout(30)
    assert devices is not None and err is None


def test_stage_bound_timeout_not_retried_in_place(monkeypatch):
    """A _bounded DEADLINE means the abandoned attempt may still be
    executing — _retry must move on (ladder fallback) instead of
    launching a contending/racing same-stage retry."""
    monkeypatch.setenv("BENCH_BACKOFF", "0")
    calls = {"n": 0}

    def hung():
        calls["n"] += 1
        raise TimeoutError("DEADLINE: classify[x] did not complete")

    record = []
    with pytest.raises(TimeoutError):
        bench._retry(hung, "classify[x]", attempts=4, record=record)
    assert calls["n"] == 1  # no same-stage retry
    assert len(record) == 1

    # Relay-raised deadline text in a NON-TimeoutError still retries
    # (that error reached us, so nothing is left running).
    calls["n"] = 0

    def relay_deadline():
        calls["n"] += 1
        raise RuntimeError("DEADLINE_EXCEEDED: rpc timed out")

    with pytest.raises(RuntimeError):
        bench._retry(relay_deadline, "x", attempts=3)
    assert calls["n"] == 3


def test_malformed_stage_timeout_env(monkeypatch):
    """BENCH_STAGE_TIMEOUT=15m must not deterministically fail every
    rung of the crash-proof bench — the default bound applies."""
    for bad in ("15m", "", "abc"):
        monkeypatch.setenv("BENCH_STAGE_TIMEOUT", bad)
        assert bench._bounded(lambda: 7, "x") == 7
