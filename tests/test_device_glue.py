"""On-device smoother equivalence vs the host reference-semantics path."""

import numpy as np
import pytest

from cut_detection_tpu.segmentation import glue
from cut_detection_tpu.segmentation.device_glue import (
    device_smooth,
    smooth_logits,
)
from cut_detection_tpu.segmentation.rle import Segmentation


def _random_scores(rng, n, segment_scale=60):
    labels = []
    while sum(len(s) for s in labels) < n:
        labels.append(np.full(int(rng.integers(1, segment_scale)),
                              rng.integers(0, 3)))
    lab = np.concatenate(labels)[:n]
    scores = rng.normal(0, 1, size=(n, 3)).astype(np.float32)
    scores[np.arange(n), lab] += rng.uniform(1, 6, size=n).astype(np.float32)
    return scores


def _host_smooth(scores, k1, kb):
    seg = Segmentation(scores)
    seg.glue_orphans(k1, kb)
    seg.combine_adjacent_segments()
    return seg.te["start_frames"], seg.te["frame_types"]


def _host_smooth_table(scores, k1, kb):
    seg = Segmentation(scores)
    seg.glue_orphans(k1, kb)
    seg.combine_adjacent_segments()
    return seg.te


@pytest.mark.parametrize("seed,n,k1,kb", [
    (0, 2000, 100, 10),
    (1, 5000, 100, 10),
    (2, 1200, 50, 5),
    (3, 8000, 100, 10),
    (4, 600, 20, 20),
    (5, 3000, 150, 30),
])
def test_device_smooth_matches_host(seed, n, k1, kb):
    rng = np.random.default_rng(seed)
    scores = _random_scores(rng, n, segment_scale=120)
    ref = _host_smooth_table(scores, k1, kb)

    conf = scores.max(1).astype(np.float32)
    pred = scores.argmax(1).astype(np.int32)
    start, typ, active, count, mean, end = device_smooth(
        conf, pred, k1, kb, max_segments=4096)
    assert int(count) <= 4096
    act = np.asarray(active)
    np.testing.assert_array_equal(np.asarray(start)[act], ref["start_frames"])
    np.testing.assert_array_equal(np.asarray(typ)[act], ref["frame_types"])
    np.testing.assert_array_equal(np.asarray(end)[act], ref["end_frames"])
    # Full-table equivalence: the device means must match the host's
    # post-merge (bug-compat) means, not placeholders.
    np.testing.assert_allclose(np.asarray(mean)[act], ref["score_means"],
                               rtol=1e-5, atol=1e-5)


def test_device_smooth_single_segment():
    scores = np.zeros((400, 3), np.float32)
    scores[:, 0] = 4.0
    conf = scores.max(1)
    pred = scores.argmax(1).astype(np.int32)
    start, typ, active, *_ = device_smooth(conf, pred, max_segments=64)
    act = np.asarray(active)
    assert act.sum() == 1
    assert np.asarray(start)[act][0] == 0
    assert np.asarray(typ)[act][0] == 0


def test_device_smooth_all_orphans_stops():
    # One short segment of each class: everything is an orphan; the loop
    # must terminate with a single surviving row (host guard: count > 1).
    pred = np.repeat([0, 1, 2], 5).astype(np.int32)
    conf = np.linspace(1, 2, 15).astype(np.float32)
    start, typ, active, *_ = device_smooth(conf, pred, 100, 10,
                                           max_segments=16)
    assert np.asarray(active).sum() == 1


def test_smooth_logits_convenience():
    rng = np.random.default_rng(9)
    scores = _random_scores(rng, 1500, segment_scale=150)
    ref_start, ref_type = _host_smooth(scores, 100, 10)
    start, typ = smooth_logits(scores)
    np.testing.assert_array_equal(start, ref_start)
    np.testing.assert_array_equal(typ, ref_type)


def test_device_smooth_stress_sweep():
    """Randomized sweep (sizes, thresholds, both mean modes) — the device
    program must reproduce the host merge order structurally every time."""
    failures = []
    for seed in range(15):
        rng = np.random.default_rng(500 + seed)
        n = int(rng.integers(300, 6000))
        scale = int(rng.integers(5, 180))
        k1 = int(rng.integers(10, 150))
        kb = int(rng.integers(2, 40))
        bug = bool(seed % 2)
        scores = _random_scores(rng, n, segment_scale=scale)
        seg = Segmentation(scores)
        seg.glue_orphans(k1, kb, bug_compat=bug)
        seg.combine_adjacent_segments(bug_compat=bug)
        conf = scores.max(1).astype(np.float32)
        pred = scores.argmax(1).astype(np.int32)
        s, t, a, c, *_ = device_smooth(conf, pred, k1, kb, max_segments=8192,
                                       bug_compat=bug)
        act = np.asarray(a)
        case = f"seed={seed} n={n} scale={scale} k1={k1} kb={kb} bug={bug}"
        if int(c) > 8192:
            failures.append(f"{case}: capacity")
            continue
        if (act.sum() != len(seg.te["start_frames"])
                or not (np.asarray(s)[act] == seg.te["start_frames"]).all()
                or not (np.asarray(t)[act] == seg.te["frame_types"]).all()):
            failures.append(f"{case}: mismatch")
    assert not failures, "\n".join(failures)


def test_bug_compat_flag_device():
    rng = np.random.default_rng(10)
    scores = _random_scores(rng, 2000, segment_scale=90)
    conf = scores.max(1).astype(np.float32)
    pred = scores.argmax(1).astype(np.int32)
    # Host with corrected means == device with corrected means.
    seg = Segmentation(scores)
    seg.glue_orphans(100, 10, bug_compat=False)
    seg.combine_adjacent_segments(bug_compat=False)
    start, typ, active, *_ = device_smooth(conf, pred, 100, 10,
                                           max_segments=4096,
                                           bug_compat=False)
    act = np.asarray(active)
    np.testing.assert_array_equal(np.asarray(start)[act],
                                  seg.te["start_frames"])
    np.testing.assert_array_equal(np.asarray(typ)[act],
                                  seg.te["frame_types"])
