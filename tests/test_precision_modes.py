"""Precision mode behavior (ops/nn.py contract)."""

import numpy as np
import pytest

from cut_detection_tpu.models.assembly import load_default_net


@pytest.fixture(scope="module")
def frames():
    rng = np.random.default_rng(0)
    return rng.random((8, 144, 256, 3), dtype=np.float32)


def test_modes_agree_on_argmax(frames):
    nets = {p: load_default_net(precision=p)[0]
            for p in ("float32", "bfloat16", "bfloat16_full",
                      "uint8_pool")}
    logits = {p: np.asarray(n(frames)) for p, n in nets.items()}
    # bf16 operand truncation moves logits by O(1e-2); class decisions on
    # non-borderline inputs must not move.
    assert np.abs(logits["float32"] - logits["bfloat16"]).max() < 0.1
    assert np.abs(logits["float32"] - logits["bfloat16_full"]).max() < 0.3
    # uint8_pool adds ~0.4% activation rounding per conv layer.
    assert np.abs(logits["float32"] - logits["uint8_pool"]).max() < 0.5
    np.testing.assert_array_equal(logits["float32"].argmax(1),
                                  logits["bfloat16"].argmax(1))
    np.testing.assert_array_equal(logits["float32"].argmax(1),
                                  logits["bfloat16_full"].argmax(1))
    np.testing.assert_array_equal(logits["float32"].argmax(1),
                                  logits["uint8_pool"].argmax(1))


def test_bf16_full_conv_outputs_bf16():
    import jax.numpy as jnp

    from cut_detection_tpu.ops.nn import conv2d_same

    x = jnp.ones((1, 8, 8, 3), jnp.float32)
    k = jnp.ones((3, 3, 3, 4), jnp.float32)
    out_full = conv2d_same(x, k, compute_dtype="bfloat16_full")
    assert out_full.dtype == jnp.bfloat16
    out_mixed = conv2d_same(x, k, compute_dtype="bfloat16")
    assert out_mixed.dtype == jnp.float32
    out_f32 = conv2d_same(x, k)
    assert out_f32.dtype == jnp.float32
