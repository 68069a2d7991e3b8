"""Resize parity tests: bit-exact vs cv2 INTER_LINEAR on uint8."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from cut_detection_tpu.ops.resize import (
    reference_resize_dims,
    resize_bilinear,
    resize_width_like_reference,
)

CASES = [
    # (in_w, in_h, out_w, out_h): broadcast-like downscales, odd sizes,
    # upscales, borders.
    (1280, 720, 256, 144),
    (1920, 1080, 256, 144),
    (640, 360, 256, 144),
    (854, 480, 256, 143),
    (100, 77, 256, 197),
    (60, 50, 256, 144),
    (640, 360, 251, 113),
    (640, 360, 137, 77),
    (33, 17, 99, 55),
]


@pytest.mark.parametrize("in_w,in_h,out_w,out_h", CASES)
def test_exact_resize_matches_cv2(in_w, in_h, out_w, out_h):
    rng = np.random.default_rng(in_w * 31 + in_h)
    img = rng.integers(0, 256, size=(in_h, in_w, 3), dtype=np.uint8)
    ref = cv2.resize(img, (out_w, out_h), interpolation=cv2.INTER_LINEAR)
    ours = np.asarray(resize_bilinear(img, out_h, out_w, exact=True))
    np.testing.assert_array_equal(ours, ref)


def test_exact_resize_batched():
    rng = np.random.default_rng(7)
    batch = rng.integers(0, 256, size=(4, 360, 640, 3), dtype=np.uint8)
    ours = np.asarray(resize_bilinear(batch, 144, 256, exact=True))
    for i in range(4):
        ref = cv2.resize(batch[i], (256, 144), interpolation=cv2.INTER_LINEAR)
        np.testing.assert_array_equal(ours[i], ref)


def test_reference_resize_dims():
    # frameID/data.py:199-202 rule, incl. the float-truncation corner.
    assert reference_resize_dims(1280, 720, 256) == (256, 144)
    assert reference_resize_dims(1920, 1080, 256) == (256, 144)
    assert reference_resize_dims(640, 360, 256) == (256, 144)
    assert reference_resize_dims(854, 480, 256) == (256, int(480 * (256 / 854)))


def test_resize_width_like_reference():
    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, size=(2, 360, 640, 3), dtype=np.uint8)
    out = np.asarray(resize_width_like_reference(img, 256))
    assert out.shape == (2, 144, 256, 3)
    ref = cv2.resize(img[0], (256, 144), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_array_equal(out[0], ref)


def test_exact_resize_random_size_sweep():
    """30 random (in, out) size pairs — broad-coverage parity vs cv2."""
    rng = np.random.default_rng(123)
    for _ in range(30):
        in_h = int(rng.integers(8, 800))
        in_w = int(rng.integers(8, 1400))
        out_h = int(rng.integers(4, 500))
        out_w = int(rng.integers(4, 600))
        img = rng.integers(0, 256, size=(in_h, in_w, 3), dtype=np.uint8)
        ref = cv2.resize(img, (out_w, out_h), interpolation=cv2.INTER_LINEAR)
        ours = np.asarray(resize_bilinear(img, out_h, out_w, exact=True))
        np.testing.assert_array_equal(
            ours, ref, err_msg=f"{in_w}x{in_h} -> {out_w}x{out_h}")


def test_float_resize_close_to_exact():
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, size=(360, 640, 3), dtype=np.uint8)
    exact = np.asarray(resize_bilinear(img, 144, 256, exact=True)).astype(np.float32)
    approx = np.asarray(resize_bilinear(img, 144, 256, exact=False))
    assert np.abs(exact - approx).max() <= 1.0
