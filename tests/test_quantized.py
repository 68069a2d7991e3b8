"""int8 quantized path tests (ops/quantized.py)."""

import numpy as np
import pytest

import jax

from cut_detection_tpu.models.assembly import _glued_apply, load_default_net
from cut_detection_tpu.ops.preprocess import normalize_frames
from cut_detection_tpu.ops.quantized import (
    quantize_bundle,
    quantize_conv_layer,
    quantized_glued_apply,
)


@pytest.fixture(scope="module")
def net():
    return load_default_net()[0]


@pytest.fixture(scope="module")
def qbundle(net):
    return quantize_bundle(jax.device_get(net.bundle))


def test_weight_quantization_roundtrip(net):
    p = jax.device_get(net.bundle["conv"]["params"][0])
    q = quantize_conv_layer(p)
    assert q["w_q"].dtype == np.int8
    # Dequantized weights within half a quantization step.
    w = np.asarray(p["kernel"], np.float32)
    deq = q["w_q"].astype(np.float32) * q["s_w"]
    assert np.abs(w - deq).max() <= (q["s_w"].max() / 2) + 1e-7


def test_quantized_logits_close_and_argmax_stable(net, qbundle):
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, size=(32, 144, 256, 3), dtype=np.uint8)
    lq = np.asarray(quantized_glued_apply(qbundle, frames,
                                          conv_cfg=net.conv_cfg,
                                          linear_cfg=net.linear_cfg))
    lf = np.asarray(_glued_apply(net.bundle,
                                 normalize_frames(jnp.asarray(frames)),
                                 conv_cfg=net.conv_cfg,
                                 linear_cfg=net.linear_cfg))
    assert np.abs(lq - lf).max() < 1.0
    np.testing.assert_array_equal(lq.argmax(1), lf.argmax(1))


def test_layer1_input_embedding_is_exact(qbundle):
    # zp_corr equals 128 * sum of quantized weights per output channel.
    q = qbundle["conv_q"][0]
    np.testing.assert_array_equal(
        q["zp_corr"],
        (128 * q["w_q"].astype(np.int64).sum(axis=(0, 1, 2))).astype(np.int32))
