"""Native C++ runtime parity tests (native/cutdet_native.cpp)."""

import numpy as np
import pytest

from cut_detection_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def test_native_resize_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(0)
    for (w, h, ow, oh) in [(1280, 720, 256, 144), (640, 360, 256, 144),
                           (100, 77, 256, 197), (640, 360, 137, 77)]:
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        ref = cv2.resize(img, (ow, oh), interpolation=cv2.INTER_LINEAR)
        ours = native.resize_bilinear_u8(img, oh, ow)
        np.testing.assert_array_equal(ours, ref)


def test_native_resize_matches_xla_path():
    from cut_detection_tpu.ops.resize import resize_bilinear

    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(360, 640, 3), dtype=np.uint8)
    xla = np.asarray(resize_bilinear(img, 144, 256, exact=True))
    nat = native.resize_bilinear_u8(img, 144, 256)
    np.testing.assert_array_equal(nat, xla)


def test_native_bgr_to_rgb_norm():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, size=(16, 20, 3), dtype=np.uint8)
    out = native.bgr_to_rgb_norm(img)
    ref = img[..., ::-1].astype(np.float32) / 255.0
    np.testing.assert_allclose(out, ref, atol=0)


def _random_scores(rng, n, segment_scale=60):
    labels = []
    while sum(len(s) for s in labels) < n:
        labels.append(np.full(int(rng.integers(1, segment_scale)),
                              rng.integers(0, 3)))
    lab = np.concatenate(labels)[:n]
    scores = rng.normal(0, 1, size=(n, 3)).astype(np.float32)
    scores[np.arange(n), lab] += rng.uniform(1, 6, size=n).astype(np.float32)
    return scores


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_native_rle_matches_python(seed):
    from cut_detection_tpu.segmentation.rle import Segmentation

    rng = np.random.default_rng(seed)
    scores = _random_scores(rng, 3000)
    conf = scores.max(1).astype(np.float32)
    pred = scores.argmax(1)
    py = Segmentation.from_frame_scores(conf, pred).te
    nat = native.rle_encode(conf, pred.astype(np.int32))
    for k in ["start_frames", "end_frames", "frame_types", "run_lengths"]:
        np.testing.assert_array_equal(nat[k], py[k], err_msg=k)
    np.testing.assert_allclose(nat["score_means"], py["score_means"],
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("seed,bug_compat", [(0, True), (1, True), (2, False)])
def test_native_glue_matches_python(seed, bug_compat):
    from cut_detection_tpu.segmentation import glue
    from cut_detection_tpu.segmentation.rle import Segmentation

    rng = np.random.default_rng(seed)
    scores = _random_scores(rng, 5000, segment_scale=120)
    conf = scores.max(1).astype(np.float32)
    pred = scores.argmax(1)
    te_py = Segmentation.from_frame_scores(conf, pred).te
    te_nat = {k: v.copy() for k, v in te_py.items()}

    te_py = glue.glue_orphans(te_py, 100, 10, bug_compat=bug_compat)
    te_py = glue.combine_adjacent_segments(te_py, bug_compat=bug_compat)

    te_nat = native.glue_orphans(te_nat, 100, 10, bug_compat=bug_compat)
    te_nat = native.combine_adjacent(te_nat, bug_compat=bug_compat)

    for k in ["start_frames", "end_frames", "frame_types", "run_lengths"]:
        np.testing.assert_array_equal(te_nat[k], te_py[k], err_msg=k)
    np.testing.assert_allclose(te_nat["score_means"], te_py["score_means"],
                               rtol=1e-5, atol=1e-5)


def test_binding_shape_validation():
    """The ctypes bindings validate shapes BEFORE crossing the C ABI —
    channel/length mismatches were out-of-bounds reads/writes."""
    import pytest

    with pytest.raises(ValueError, match="BGR"):
        native.bgr_to_rgb_norm(np.zeros((4, 4, 1), np.uint8))
    with pytest.raises(ValueError, match="positive"):
        native.resize_bilinear_u8(np.zeros((0, 4, 3), np.uint8), 2, 2)
    with pytest.raises(ValueError, match="positive"):
        native.resize_bilinear_u8(np.zeros((4, 4, 3), np.uint8), -1, 2)
    with pytest.raises(ValueError, match="equal-length"):
        native.rle_encode(np.zeros(5, np.float32), np.zeros(4, np.int32))


def test_glue_does_not_corrupt_callers_table():
    """The merge loops work on private copies: the caller's table is
    byte-identical afterwards (memmove used to scramble the aliased
    input arrays)."""
    rng = np.random.default_rng(0)
    n = 40
    conf = rng.random(n).astype(np.float32) + 1.0
    pred = rng.integers(0, 3, n).astype(np.int32)
    te = native.rle_encode(conf, pred)
    before = {k: v.copy() for k, v in te.items()}
    native.glue_orphans(te, 5, 2)
    native.combine_adjacent(te)
    for k in te:
        np.testing.assert_array_equal(te[k], before[k])
