"""REAL streamlit click-through of the labelling UI (VERDICT r2 item 9).

Runs only where streamlit is installed — locally this image has no
network so the suite skips it; CI's label-ui job (ci.yml) installs
streamlit and runs this file explicitly.  Unlike the scripted-double
tests (test_labelling_ui.py), this drives the actual streamlit runtime
through its official AppTest harness: a button click re-runs the script
and must write the reference-format ``labels.json``
(/root/reference/training_scripts/labelling.py:29-36,52-59).
"""

import json
import os

import numpy as np
import pytest

st = pytest.importorskip("streamlit")
from streamlit.testing.v1 import AppTest  # noqa: E402


@pytest.fixture
def frames_dir(tmp_path):
    cv2 = pytest.importorskip("cv2")
    d = tmp_path / "frames"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(5):
        cv2.imwrite(str(d / f"frame_{i:07}.jpg"),
                    rng.integers(0, 255, (36, 64, 3), dtype=np.uint8))
    return str(d)


def _make_app(data_dir):
    from cut_detection_tpu.cli.labelling import _streamlit_app

    return AppTest.from_function(_streamlit_app, args=(data_dir,))


def test_button_click_writes_labels_json(frames_dir):
    at = _make_app(frames_dir)
    at.run()
    assert not at.exception
    labels = [b.label for b in at.button]
    assert labels == ["Endzone", "All-22", "Blank"]
    assert not os.path.exists(os.path.join(frames_dir, "labels.json"))

    at.button[0].click().run()
    assert not at.exception
    path = os.path.join(frames_dir, "labels.json")
    assert os.path.isfile(path)
    with open(path) as f:
        data = json.load(f)
    # Reference contract: {str(frame_idx): label}, labels.py vocabulary.
    assert len(data) == 1
    (idx, lab), = data.items()
    assert lab == "EZ"
    assert idx.isdigit() and 0 <= int(idx) < 5


def test_multiple_clicks_accumulate(frames_dir):
    at = _make_app(frames_dir)
    at.run()
    at.button[1].click().run()  # All-22
    at.button[2].click().run()  # Blank
    with open(os.path.join(frames_dir, "labels.json")) as f:
        data = json.load(f)
    # 1 or 2 entries (random idx may repeat); values from the vocabulary.
    assert 1 <= len(data) <= 2
    assert set(data.values()) <= {"A22", "B"}
