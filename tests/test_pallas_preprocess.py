"""Pallas fused preprocess kernel tests (interpret mode on CPU)."""

import numpy as np
import pytest

import jax


def _fused(frames, out_h, out_w):
    """Run the kernel in interpreter mode (CPU test environment)."""
    from jax.experimental import pallas as pl  # noqa: F401
    from cut_detection_tpu.ops.pallas import preprocess_kernel as pk

    # Force interpret mode for the CPU backend.
    import contextlib

    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        return pk.fused_resize_normalize(frames, out_h, out_w)


@pytest.mark.parametrize("in_h,in_w,out_h,out_w", [
    (360, 640, 144, 256),
    (77, 100, 55, 77),
])
def test_fused_kernel_matches_float_resize(in_h, in_w, out_h, out_w):
    from cut_detection_tpu.ops.preprocess import normalize_frames
    from cut_detection_tpu.ops.resize import resize_bilinear

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, size=(2, in_h, in_w, 3), dtype=np.uint8)
    fused = np.asarray(_fused(frames, out_h, out_w))
    # Reference: float bilinear resize, then BGR flip + /255.
    resized = np.asarray(resize_bilinear(frames, out_h, out_w, exact=False))
    ref = resized[..., ::-1] / 255.0
    assert fused.shape == (2, out_h, out_w, 3)
    np.testing.assert_allclose(fused, ref, atol=2e-3)


def test_fused_kernel_channel_flip():
    # A pure-blue BGR frame must come out as (0, 0, 1) RGB.
    frames = np.zeros((1, 36, 64, 3), dtype=np.uint8)
    frames[..., 0] = 255  # blue channel in BGR
    out = np.asarray(_fused(frames, 18, 32))
    np.testing.assert_allclose(out[..., 2], 1.0, atol=1e-5)
    np.testing.assert_allclose(out[..., 0], 0.0, atol=1e-5)
    np.testing.assert_allclose(out[..., 1], 0.0, atol=1e-5)


def test_fused_kernel_close_to_exact_u8_path():
    from cut_detection_tpu.ops.resize import resize_bilinear

    rng = np.random.default_rng(1)
    frames = rng.integers(0, 256, size=(1, 360, 640, 3), dtype=np.uint8)
    fused = np.asarray(_fused(frames, 144, 256))
    exact = np.asarray(resize_bilinear(frames, 144, 256, exact=True))
    exact = exact[..., ::-1].astype(np.float32) / 255.0
    # Fixed-point vs float bilinear differ by at most ~1/255 per pixel.
    assert np.abs(fused - exact).max() <= 1.5 / 255.0
