"""Evaluation tool tests (cli/evaluate.py)."""

import csv

import numpy as np
import pytest

from cut_detection_tpu.cli.evaluate import evaluate, frame_labels


def _write(path, rows):
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        for r in rows:
            w.writerow(r)


def test_perfect_match(tmp_path):
    rows = [(0, "b"), (100, "a22"), (400, "ez")]
    a = tmp_path / "a.csv"
    b = tmp_path / "b.csv"
    _write(a, rows)
    _write(b, rows)
    res = evaluate(str(a), str(b), num_frames=600)
    assert res["frame_accuracy"] == 1.0
    assert res["boundary_precision"] == 1.0
    assert res["boundary_recall"] == 1.0
    assert res["pred_segments"] == 3


def test_shifted_boundary(tmp_path):
    truth = [(0, "b"), (100, "a22")]
    pred = [(0, "b"), (110, "a22")]
    t = tmp_path / "t.csv"
    p = tmp_path / "p.csv"
    _write(t, truth)
    _write(p, pred)
    res = evaluate(str(p), str(t), num_frames=200, tolerance=30)
    # 10 frames mislabeled out of 200.
    assert res["frame_accuracy"] == 0.95
    assert res["boundary_precision"] == 1.0  # within tolerance
    res5 = evaluate(str(p), str(t), num_frames=200, tolerance=5)
    assert res5["boundary_precision"] == 0.0


def test_missing_class_reports_none(tmp_path):
    t = tmp_path / "t.csv"
    p = tmp_path / "p.csv"
    _write(t, [(0, "a22")])
    _write(p, [(0, "a22")])
    res = evaluate(str(p), str(t), num_frames=50)
    assert res["per_class_accuracy"]["ez"] is None
    assert res["per_class_accuracy"]["a22"] == 1.0


def test_frame_labels_expansion():
    labels = frame_labels([(0, "b"), (5, "ez")], 8)
    np.testing.assert_array_equal(labels, [2, 2, 2, 2, 2, 1, 1, 1])


def test_reads_crlf_csv(tmp_path):
    """The pipeline's own output format (\\r\\n, segmentation.py:193-196)
    parses cleanly."""
    from cut_detection_tpu.cli.evaluate import read_segments_csv

    p = tmp_path / "crlf.csv"
    p.write_bytes(b"0,b\r\n10,a22\r\n")
    assert read_segments_csv(str(p)) == [(0, "b"), (10, "a22")]


def test_main_prints_json(tmp_path, capsys):
    from cut_detection_tpu.cli.evaluate import main

    a = tmp_path / "a.csv"
    _write(a, [(0, "a22")])
    result = main([str(a), str(a), "--num-frames", "30"])
    import json

    printed = json.loads(capsys.readouterr().out.strip())
    assert printed == result
    assert printed["frame_accuracy"] == 1.0


def test_num_frames_optional(tmp_path):
    """Omitted num_frames is assumed one past the last boundary and
    reported explicitly; boundary metrics are unaffected."""
    rows = [(0, "b"), (100, "a22"), (400, "ez")]
    a = tmp_path / "a.csv"
    b = tmp_path / "b.csv"
    _write(a, rows)
    _write(b, rows)
    res = evaluate(str(a), str(b), num_frames=None)
    assert res["num_frames_assumed"] == 401
    assert res["frame_accuracy"] == 1.0
    assert res["boundary_precision"] == 1.0
    assert res["boundary_recall"] == 1.0
    # Explicit num_frames must not report the assumption.
    assert "num_frames_assumed" not in evaluate(str(a), str(b), 600)


def test_uppercase_labels_accepted(tmp_path):
    """The labelling tool records EZ/A22/B; evaluate accepts them
    case-insensitively instead of crashing with a bare KeyError."""
    pred = tmp_path / "p.csv"
    truth = tmp_path / "t.csv"
    pred.write_text("0,ez\r\n50,a22\r\n")
    truth.write_text("0,EZ\r\n50,A22\r\n")
    from cut_detection_tpu.cli.evaluate import evaluate

    res = evaluate(str(pred), str(truth), 100)
    assert res["frame_accuracy"] == 1.0


def test_unknown_label_is_clear_error(tmp_path):
    pred = tmp_path / "p.csv"
    truth = tmp_path / "t.csv"
    pred.write_text("0,ez\r\n")
    truth.write_text("0,zebra\r\n")
    from cut_detection_tpu.cli.evaluate import evaluate

    with pytest.raises(SystemExit, match="zebra"):
        evaluate(str(pred), str(truth), 10)


def test_uncovered_frames_do_not_inflate_accuracy(tmp_path):
    """Frames before the truth CSV's first boundary are unlabeled and
    must be excluded from frame accuracy (-1 == -1 used to count as
    correct)."""
    pred = tmp_path / "p.csv"
    truth = tmp_path / "t.csv"
    pred.write_text("0,b\r\n")        # predicts blank everywhere
    truth.write_text("90,ez\r\n")     # truth only covers frames 90-99
    from cut_detection_tpu.cli.evaluate import evaluate

    res = evaluate(str(pred), str(truth), 100)
    # Prediction matches the covered region on 0 of 10 frames; the 90
    # uncovered frames must not be scored.
    assert res["frame_accuracy"] == 0.0
