"""Space-to-depth fused frontend parity tests (ops/fused_frontend.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cut_detection_tpu.models.assembly import load_default_net
from cut_detection_tpu.models.layers import apply_conv_block
from cut_detection_tpu.ops.fused_frontend import (
    conv1_maxpool_fused,
    expanded_kernel,
)


@pytest.fixture(scope="module")
def layer1():
    net, _ = load_default_net()
    return (net.bundle["conv"]["params"][0], net.bundle["conv"]["state"][0])


@pytest.mark.parametrize("h,w", [(144, 256), (77, 100), (9, 9), (6, 7)])
def test_fused_matches_standard_path_f32(layer1, h, w):
    p, s = layer1
    rng = np.random.default_rng(h * w)
    x = jnp.asarray(rng.random((2, h, w, 3), dtype=np.float32))
    ref, _ = apply_conv_block(p, s, x, train=False)
    fused = conv1_maxpool_fused(x, p["kernel"], p["bias"], s["mean"],
                                s["var"], p["gamma"], p["beta"],
                                compute_dtype=None)
    assert fused.shape == ref.shape
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=1e-4)


def test_expanded_kernel_structure():
    rng = np.random.default_rng(0)
    k = rng.standard_normal((3, 3, 3, 4)).astype(np.float32)
    w = np.asarray(expanded_kernel(k))
    assert w.shape == (75, 36)
    # Sub-position (0,0), output o reads patch pixels (dy,dx) 0..2 x 0..2.
    np.testing.assert_array_equal(w[0:3, 0:4], k[0, 0])           # iy=ix=0
    np.testing.assert_array_equal(w[(2 * 5 + 2) * 3:(2 * 5 + 2) * 3 + 3, 0:4],
                                  k[2, 2])
    # Sub-position (2,2) reads pixels (2..4, 2..4).
    col = (2 * 3 + 2) * 4
    np.testing.assert_array_equal(
        w[(4 * 5 + 4) * 3:(4 * 5 + 4) * 3 + 3, col:col + 4], k[2, 2])
    # Pixel (0,0) is unused by sub-position (2,2).
    np.testing.assert_array_equal(w[0:3, col:col + 4], 0.0)


def test_glued_apply_uses_fused_only_in_perf_modes():
    rng = np.random.default_rng(1)
    x = rng.random((4, 144, 256, 3), dtype=np.float32)
    f32_net, _ = load_default_net()
    perf_net, _ = load_default_net(precision="bfloat16_full")
    l32 = np.asarray(f32_net(x))
    lp = np.asarray(perf_net(x))
    assert np.abs(l32 - lp).max() < 0.3
    np.testing.assert_array_equal(l32.argmax(1), lp.argmax(1))
