"""cutdet-doctor diagnostic CLI (cli/doctor.py)."""

import json

import pytest

from cut_detection_tpu.cli import doctor


def test_doctor_healthy_json(capsys):
    with pytest.raises(SystemExit) as ei:
        doctor.main(["--json"])
    assert ei.value.code == 0
    payload = json.loads(capsys.readouterr().out.strip())
    assert payload["healthy"] is True
    names = [c["check"] for c in payload["checks"]]
    assert names[:2] == ["backend-init", "device-compute"]
    assert "decode-cv2" in names
    for c in payload["checks"]:
        if c["required"]:
            assert c["ok"], c


def test_doctor_full_runs_classify_step(capsys):
    with pytest.raises(SystemExit) as ei:
        doctor.main(["--json", "--full"])
    assert ei.value.code == 0
    payload = json.loads(capsys.readouterr().out.strip())
    step = [c for c in payload["checks"] if c["check"] == "classify-step"]
    assert step and step[0]["ok"]
    assert step[0]["detail"] == {"params": 67971}


def test_doctor_hung_backend_reports_fail(monkeypatch, capsys):
    """A wedged tunnel (jax.devices() hangs) is a FAILED check and exit
    1, never a hung doctor."""
    import sys as _sys
    import time
    import types

    hang = types.ModuleType("jax")
    hang.devices = lambda: time.sleep(60)
    monkeypatch.setitem(_sys.modules, "jax", hang)
    monkeypatch.setenv("CUTDET_INIT_TIMEOUT", "0.2")
    with pytest.raises(SystemExit) as ei:
        doctor.main(["--json", "--timeout", "0.2"])
    assert ei.value.code == 1
    payload = json.loads(capsys.readouterr().out.strip())
    assert payload["healthy"] is False
    init = payload["checks"][0]
    assert init["check"] == "backend-init" and not init["ok"]
    assert "did not complete" in init["error"]
    # Device checks are skipped once init failed; host checks still ran.
    names = [c["check"] for c in payload["checks"]]
    assert "device-compute" not in names
    assert "decode-cv2" in names


def test_doctor_human_output(capsys):
    with pytest.raises(SystemExit) as ei:
        doctor.main([])
    assert ei.value.code == 0
    out = capsys.readouterr().out
    assert "[ok  ] backend-init" in out
    assert out.strip().endswith("healthy")
