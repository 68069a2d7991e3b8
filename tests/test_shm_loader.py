"""Subprocess decode loader (data/shm_loader.py): unit + pipeline parity.

The loader exists because relay-attached device transfers block with the
GIL held (scripts/probe_e2e_phase2.py), so only a decode PROCESS can
overlap decode with transfer.  These tests pin the contract that matters
for CSV parity: the subprocess path yields byte-identical batches to the
in-process ``batch_frames`` path, under every consumption pattern.
"""

import numpy as np
import pytest

from cut_detection_tpu.data.shm_loader import ShmDecodeLoader
from cut_detection_tpu.data.video import VideoFrameSource, batch_frames
from cut_detection_tpu.pipeline import _resolve_decode_process, classify_video


def _inprocess_batches(path, batch_size, resize=256):
    return list(batch_frames(VideoFrameSource(path, resize=resize),
                             batch_size))


def test_shm_loader_matches_inprocess_batches(synthetic_video):
    loader = ShmDecodeLoader(synthetic_video, batch_size=32, resize=256,
                             copy_out=True)
    got = list(loader)
    want = _inprocess_batches(synthetic_video, 32)
    assert len(got) == len(want)
    for (gb, gv), (wb, wv) in zip(got, want):
        assert gv == wv
        np.testing.assert_array_equal(gb, wb)
    assert loader.frames_failed == 0
    assert loader.video_info["length"] == 240
    assert loader.length == 240


def test_shm_loader_view_mode_matches_when_consumed_in_place(synthetic_video):
    """copy_out=False yields ring VIEWS valid until the next next() —
    the consumer contract classify_video honors (device_put returns
    before it advances).  Consuming each view before advancing matches."""
    loader = ShmDecodeLoader(synthetic_video, batch_size=32, resize=256,
                             copy_out=False)
    sums, valids = [], []
    for b, v in loader:
        sums.append(b.astype(np.int64).sum())  # consume before next()
        valids.append(v)
    want = _inprocess_batches(synthetic_video, 32)
    assert valids == [v for _, v in want]
    assert sums == [b.astype(np.int64).sum() for b, _ in want]


def test_shm_loader_close_early_stops_child(synthetic_video):
    loader = ShmDecodeLoader(synthetic_video, batch_size=32, resize=256,
                             copy_out=True, slots=2)
    it = iter(loader)
    next(it)
    loader.close()
    assert loader._proc.exitcode is not None  # joined, not leaked
    # close() is idempotent and iteration after close ends cleanly.
    loader.close()


def test_shm_loader_native_resolution(synthetic_video):
    loader = ShmDecodeLoader(synthetic_video, batch_size=16, resize=None,
                             copy_out=True)
    b, v = next(iter(loader))
    assert b.shape == (16, 360, 640, 3)
    assert v == 16
    loader.close()


def test_shm_loader_is_single_use(synthetic_video):
    loader = ShmDecodeLoader(synthetic_video, batch_size=64, resize=256,
                             copy_out=True)
    list(loader)
    with pytest.raises(RuntimeError, match="single-use"):
        iter(loader)


def test_shm_loader_rejects_missing_file(tmp_path):
    with pytest.raises(Exception):
        ShmDecodeLoader(str(tmp_path / "nope.mp4"), batch_size=8)


def test_classify_decode_process_matches(synthetic_video):
    """The subprocess decode path is score-identical to the in-process
    path (so CSV parity is unchanged), including under the reference's
    frame-limit early break (which must also stop the child)."""
    a = classify_video(synthetic_video, batch_size=32, print_every=0,
                       decode_process=True)
    b = classify_video(synthetic_video, batch_size=32, print_every=0,
                       decode_process=False)
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])
    assert a[2].frames == b[2].frames

    la = classify_video(synthetic_video, batch_size=32, frame_limit=50,
                        print_every=0, decode_process=True)
    lb = classify_video(synthetic_video, batch_size=32, frame_limit=50,
                        print_every=0, decode_process=False)
    np.testing.assert_array_equal(la[0], lb[0])
    np.testing.assert_array_equal(la[1], lb[1])


def test_decode_process_auto_resolves_by_backend():
    # The test mesh is CPU: auto must stay in-process (spawn per tiny
    # video would dominate); explicit booleans pass through.
    assert _resolve_decode_process("auto") is False
    assert _resolve_decode_process(True) is True
    assert _resolve_decode_process(False) is False
