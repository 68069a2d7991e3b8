"""Dataset and loader tests (data/frames.py, data/loader.py, data/video.py)."""

import csv
import os

import numpy as np
import pytest

from tests.conftest import import_reference, reference_available

from cut_detection_tpu.data.frames import (
    ConcatDataset,
    ContrastiveFrameDataset,
    SupervisedFrameDataset,
)
from cut_detection_tpu.data.loader import PrefetchLoader, iter_batches


@pytest.fixture(scope="module")
def frame_tree(tmp_path_factory):
    """A small extracted-frames directory with a labels CSV."""
    cv2 = pytest.importorskip("cv2")
    root = tmp_path_factory.mktemp("frames")
    rng = np.random.default_rng(0)
    for i in range(30):
        img = rng.integers(0, 256, size=(36, 64, 3), dtype=np.uint8)
        cv2.imwrite(str(root / f"frame_{i:07}.jpg"), img)
    with open(root / "frames.csv", "w", newline="") as f:
        w = csv.writer(f)
        # Ranges: [0,10) a22, [10,14) b, [14,30) ez  (start_frame, label).
        w.writerow([0, "a22"])
        w.writerow([10, "b"])
        w.writerow([14, "ez"])
    return str(root)


def test_supervised_dataset_labels(frame_tree):
    ds = SupervisedFrameDataset(frame_tree, "frames.csv")
    assert len(ds) == 30
    assert ds[0]["y"] == 0
    assert ds[9]["y"] == 0
    assert ds[10]["y"] == 2   # "b"
    assert ds[13]["y"] == 2
    assert ds[14]["y"] == 1   # "ez"
    assert ds[29]["y"] == 1
    item = ds[5]
    assert item["x"].dtype == np.uint8
    assert item["x"].shape == (36, 64, 3)


@reference_available
def test_label_lookup_matches_reference(frame_tree, torch):
    """Same searchsorted-right-minus-one semantics as frameID/data.py:162-166."""
    data_mod = import_reference("frameID.data")
    ref = data_mod.SupervisedFrameDataset(frame_tree, labs_file="frames.csv")
    ours = SupervisedFrameDataset(frame_tree, "frames.csv")
    for idx in range(30):
        assert ours._get_label(idx) == int(ref._get_label(idx))


def test_file_list_is_sorted(frame_tree):
    ds = SupervisedFrameDataset(frame_tree, "frames.csv")
    assert ds.file_list == sorted(ds.file_list)


def test_dataset_size_cap(frame_tree):
    ds = SupervisedFrameDataset(frame_tree, "frames.csv", size=7)
    assert len(ds) == 7


def test_invalid_extension_raises(frame_tree):
    with pytest.raises(ValueError):
        SupervisedFrameDataset(frame_tree, "frames.csv", ext=".exe")
    with pytest.raises(ValueError):
        ContrastiveFrameDataset(frame_tree, ext=".exe")


def test_contrastive_dataset(frame_tree):
    ds = ContrastiveFrameDataset(frame_tree)
    assert len(ds) == 30
    assert ds[3]["x"].dtype == np.uint8
    # Host-side transform path (API compat with frameID/data.py:86-93).
    ds_t = ContrastiveFrameDataset(frame_tree, trs=lambda x: x * 0.5)
    item = ds_t[3]
    np.testing.assert_allclose(item["x_t1"], item["x"] * 0.5)
    assert "x_t2" in item


def test_concat_dataset(frame_tree):
    a = SupervisedFrameDataset(frame_tree, "frames.csv", size=10)
    b = SupervisedFrameDataset(frame_tree, "frames.csv", size=5)
    cat = ConcatDataset([a, b])
    assert len(cat) == 15
    np.testing.assert_array_equal(cat[12]["x"], b[2]["x"])


def test_iter_batches_shapes_and_drop_last(frame_tree):
    ds = SupervisedFrameDataset(frame_tree, "frames.csv")
    batches = list(iter_batches(ds, 8, drop_last=True))
    assert len(batches) == 3
    assert batches[0]["x"].shape == (8, 36, 64, 3)
    assert batches[0]["y"].shape == (8,)
    batches = list(iter_batches(ds, 8, drop_last=False))
    assert len(batches) == 4
    assert batches[-1]["x"].shape[0] == 6


def test_iter_batches_shuffle_deterministic(frame_tree):
    ds = SupervisedFrameDataset(frame_tree, "frames.csv")
    a = [b["y"] for b in iter_batches(ds, 8, shuffle=True, seed=1)]
    b = [b["y"] for b in iter_batches(ds, 8, shuffle=True, seed=1)]
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_iter_batches_workers_match_serial(frame_tree):
    ds = SupervisedFrameDataset(frame_tree, "frames.csv")
    serial = list(iter_batches(ds, 8))
    threaded = list(iter_batches(ds, 8, num_workers=4))
    for s, t in zip(serial, threaded):
        np.testing.assert_array_equal(s["x"], t["x"])
        np.testing.assert_array_equal(s["y"], t["y"])


def test_prefetch_loader_order_and_errors():
    assert list(PrefetchLoader(range(10))) == list(range(10))

    def boom():
        yield 1
        raise RuntimeError("decode failed")

    it = iter(PrefetchLoader(boom()))
    assert next(it) == 1
    with pytest.raises(RuntimeError):
        next(it)


def test_video_dataset_float_conversion(synthetic_video):
    from cut_detection_tpu.data.video import VideoDataset, VideoFrameSource

    u8 = next(iter(VideoFrameSource(synthetic_video, resize=256)))
    f32 = next(iter(VideoDataset(synthetic_video, resize=256)))
    np.testing.assert_allclose(
        f32, u8[..., ::-1].astype(np.float32) / 255.0, atol=0)


@reference_available
def test_video_frames_match_reference_dataset(synthetic_video, torch):
    """Our uint8 BGR frames + flip/scale == the reference VideoDataset's
    float CHW RGB output (frameID/data.py:211-230), frame for frame."""
    data_mod = import_reference("frameID.data")
    ref_ds = data_mod.VideoDataset(synthetic_video, resize=256)
    from cut_detection_tpu.data.video import VideoDataset

    ours = VideoDataset(synthetic_video, resize=256)
    for i, (r, o) in enumerate(zip(ref_ds, ours)):
        np.testing.assert_allclose(r.numpy().transpose(1, 2, 0), o, atol=0,
                                   err_msg=f"frame {i}")
        if i > 20:
            break
