"""Execute the streamlit branch of the labelling CLI (VERDICT r1 item 1).

streamlit cannot be installed in this image, so the test injects a
scripted test double that implements the exact API surface the app uses
(markdown / image / button) with streamlit's execution model: the script
re-runs top to bottom per interaction, and ``button(label)`` returns True
only for the widget clicked in the current run.  This makes the
previously never-executed ``_streamlit_app`` path run for real, with its
output checked against the reference's labels.json contract
(/root/reference/training_scripts/labelling.py:29-36,52-59).

The real-streamlit smoke (pip install + headless ``streamlit run``) lives
in CI (.github/workflows/ci.yml, label-ui job), where the network exists.
"""

import json
import os
import sys
import types

import numpy as np
import pytest


class _SessionState(dict):
    """streamlit.session_state double: dict + attribute access + `in`."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k) from None

    def __setattr__(self, k, v):
        self[k] = v


class _ScriptedStreamlit(types.ModuleType):
    """Minimal streamlit double: one scripted button press per re-run."""

    def __init__(self, presses):
        super().__init__("streamlit")
        self._presses = list(presses)
        self._current = None
        self.rendered = []
        self.session_state = _SessionState()  # persists across re-runs

    def next_run(self):
        self._current = self._presses.pop(0) if self._presses else None

    def markdown(self, text):
        self.rendered.append(("markdown", text))

    def image(self, img, width=None):
        self.rendered.append(("image", np.asarray(img).shape))

    def button(self, label):
        self.rendered.append(("button", label))
        return label == self._current


@pytest.fixture
def label_frames(tmp_path):
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(0)
    for i in range(10):
        img = rng.integers(0, 256, size=(36, 64, 3), dtype=np.uint8)
        cv2.imwrite(str(tmp_path / f"frame_{i:07}.jpg"), img)
    return str(tmp_path)


def test_streamlit_app_executes_and_writes_labels(label_frames, monkeypatch):
    from cut_detection_tpu.cli import labelling

    presses = [None, "Endzone", "All-22", "Blank"]  # 4 re-runs
    st = _ScriptedStreamlit(presses)
    monkeypatch.setitem(sys.modules, "streamlit", st)

    for _ in range(4):
        st.next_run()
        # Through main() WITHOUT --terminal: the streamlit branch runs.
        labelling.main([label_frames])

    labels = json.load(open(os.path.join(label_frames, "labels.json")))
    # Contract of the reference app: {str(frame_idx): label}; one write
    # per clicked run (same random idx may overwrite).
    assert 1 <= len(labels) <= 3
    for k, v in labels.items():
        assert k.isdigit() and 0 <= int(k) < 10
        assert v in {"EZ", "A22", "B"}

    # The UI surface matches the reference: three buttons with these
    # captions (labelling.py:52-59), a frame image, and the status lines.
    buttons = [p for kind, p in st.rendered if kind == "button"]
    assert buttons[:3] == ["Endzone", "All-22", "Blank"]
    assert any(kind == "image" for kind, _ in st.rendered)
    md = [p for kind, p in st.rendered if kind == "markdown"]
    assert any(p.startswith("*Previous label:") for p in md)
    assert any(p.startswith("**Labels:") for p in md)


def test_streamlit_label_lands_on_displayed_frame(label_frames, monkeypatch):
    """The frame index survives the click's re-run via session_state, so
    the label is recorded against the frame the user actually judged.
    (The reference re-randomizes per run — labelling.py:42-61 — sending
    every label to a random unseen frame; deliberately fixed here.)"""
    from cut_detection_tpu.cli import labelling

    st = _ScriptedStreamlit([None, "Endzone"])
    monkeypatch.setitem(sys.modules, "streamlit", st)
    st.next_run()
    labelling.main([label_frames])          # run 1: display a frame
    shown = st.session_state["cutdet_idx"]
    st.next_run()
    labelling.main([label_frames])          # run 2: click Endzone
    labels = json.load(open(os.path.join(label_frames, "labels.json")))
    assert labels == {str(shown): "EZ"}
    # A fresh frame is drawn for the next interaction.
    assert "cutdet_idx" in st.session_state


def test_streamlit_app_shows_previous_label(label_frames, monkeypatch):
    from cut_detection_tpu.cli import labelling

    labelling.write_label(label_frames, {}, 3, "EZ")
    st = _ScriptedStreamlit([None])
    monkeypatch.setitem(sys.modules, "streamlit", st)
    # Pin the random frame choice so the previous label is displayed.
    fixed = types.SimpleNamespace(integers=lambda n: 3)
    monkeypatch.setattr(np.random, "default_rng", lambda *a, **k: fixed)
    st.next_run()
    labelling.main([label_frames])
    md = [p for kind, p in st.rendered if kind == "markdown"]
    assert any("Previous label: EZ" in p for p in md)
