"""Committed golden fixtures: regression anchor independent of the oracle.

``tests/golden/`` holds a small deterministic clip plus the PyTorch
reference's outputs for it (segments CSV + logits of the first 32 frames),
generated once against /root/reference.  These tests re-run the TPU-native
pipeline against the stored artifacts, so parity regressions are caught
even in environments where the reference checkout or torch is absent.
"""

import os

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
CLIP = os.path.join(GOLDEN, "clip.mp4")

pytestmark = pytest.mark.skipif(not os.path.isfile(CLIP),
                                reason="golden fixtures missing")


@pytest.mark.parametrize("precision", ["float32", "uint8_pool",
                                       "int8_mxu"])
def test_pipeline_matches_golden_csv(tmp_path, precision):
    """float32 is the byte-parity promise; the uint8_pool and int8_mxu
    rows are regression PINs of behavior verified against the oracle
    (docs/PARITY.md) — those modes promise accuracy-gating, not byte
    parity, so if an XLA rounding change ever moves a borderline frame,
    re-verify on hardware and update the pin rather than treating it as
    a product bug."""
    from cut_detection_tpu.pipeline import segment_video_file

    out = str(tmp_path / f"out_{precision}.csv")
    segment_video_file(CLIP, out, batch_size=64, print_every=0,
                       precision=precision)
    with open(out, "rb") as f, open(
            os.path.join(GOLDEN, "ref_segments.csv"), "rb") as g:
        assert f.read() == g.read()


def test_logits_match_golden():
    import itertools

    from cut_detection_tpu.data.video import VideoFrameSource
    from cut_detection_tpu.models.assembly import load_default_net
    from cut_detection_tpu.ops.preprocess import normalize_frames

    frames = np.stack(list(itertools.islice(
        VideoFrameSource(CLIP, resize=256), 32)))
    net, _ = load_default_net()
    logits = np.asarray(net(np.asarray(normalize_frames(frames))))
    ref = np.load(os.path.join(GOLDEN, "ref_logits_first32.npy"))
    assert np.abs(logits - ref).max() < 1e-4
    np.testing.assert_array_equal(logits.argmax(1), ref.argmax(1))


def test_native_decoder_matches_golden_csv(tmp_path):
    from cut_detection_tpu.data import native_video

    if not native_video.available():
        pytest.skip("native decoder not built")
    from cut_detection_tpu.pipeline import segment_video_file

    out = str(tmp_path / "out.csv")
    segment_video_file(CLIP, out, batch_size=64, print_every=0,
                       decoder="native", decode_workers=2)
    with open(out, "rb") as f, open(
            os.path.join(GOLDEN, "ref_segments.csv"), "rb") as g:
        assert f.read() == g.read()


def test_pipeline_matches_golden_csv_odd_geometry(tmp_path):
    """427x240 source -> 256x143 resize: odd height + odd source width."""
    clip = os.path.join(GOLDEN, "clip_odd.mp4")
    if not os.path.isfile(clip):
        pytest.skip("odd golden fixture missing")
    from cut_detection_tpu.pipeline import segment_video_file

    out = str(tmp_path / "out.csv")
    segment_video_file(clip, out, batch_size=64, print_every=0)
    with open(out, "rb") as f, open(
            os.path.join(GOLDEN, "ref_segments_odd.csv"), "rb") as g:
        assert f.read() == g.read()
