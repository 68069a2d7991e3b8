"""Preprocess op tests (ops/preprocess.py)."""

import numpy as np
import pytest

from cut_detection_tpu.ops.preprocess import normalize_frames, preprocess_u8_batch


def test_normalize_matches_reference_semantics(torch):
    """flip(permute(f32(frame)))/255 from frameID/data.py:224-228, modulo
    layout (we stay HWC)."""
    rng = np.random.default_rng(0)
    bgr = rng.integers(0, 256, size=(2, 9, 11, 3), dtype=np.uint8)
    ours = np.asarray(normalize_frames(bgr))
    for i in range(2):
        ref = (torch.flip(
            torch.tensor(bgr[i], dtype=torch.float).permute(2, 0, 1), (0,))
            / 255).numpy().transpose(1, 2, 0)
        np.testing.assert_allclose(ours[i], ref, atol=0)


def test_preprocess_with_device_resize_matches_host_path():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(1)
    raw = rng.integers(0, 256, size=(2, 360, 640, 3), dtype=np.uint8)
    on_device = np.asarray(preprocess_u8_batch(raw, 144, 256, exact=True))
    host_resized = np.stack([
        cv2.resize(f, (256, 144), interpolation=cv2.INTER_LINEAR)
        for f in raw
    ])
    host_path = np.asarray(normalize_frames(host_resized))
    np.testing.assert_allclose(on_device, host_path, atol=0)


def test_preprocess_without_resize_is_normalize():
    rng = np.random.default_rng(2)
    x = rng.integers(0, 256, size=(1, 8, 8, 3), dtype=np.uint8)
    np.testing.assert_allclose(np.asarray(preprocess_u8_batch(x)),
                               np.asarray(normalize_frames(x)), atol=0)
