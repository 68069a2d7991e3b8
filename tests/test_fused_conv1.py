"""Fused conv1+ReLU+pool+BN Mosaic kernel vs the ops/nn oracle.

On CPU the kernel runs in interpreter mode (same program, no Mosaic
compile); hardware numerics and throughput are covered by bench.py and
docs/PERFORMANCE.md.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cut_detection_tpu.ops.nn import batch_norm_infer, max_pool
from cut_detection_tpu.ops.pallas.fused_conv1 import (
    _strip_rows_for,
    fused_conv1_pool,
)


def _params(rng):
    return (
        rng.normal(0, 0.1, size=(3, 3, 3, 48)).astype(np.float32),
        rng.normal(0, 0.1, 48).astype(np.float32),
        rng.normal(1, 0.1, 48).astype(np.float32),
        rng.normal(0, 0.1, 48).astype(np.float32),
        rng.normal(0, 0.5, 48).astype(np.float32),
        rng.uniform(0.5, 2, 48).astype(np.float32),
    )


def _oracle(x_u8, k, bias, gamma, beta, mean, var):
    """bfloat16_full-numerics layer 1 through the shipped ops."""
    xf = jnp.asarray(x_u8).astype(jnp.float32)
    conv = jax.lax.conv_general_dilated(
        xf.astype(jnp.bfloat16), jnp.asarray(k).astype(jnp.bfloat16),
        (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    z = jnp.maximum(conv + bias, 0).astype(jnp.bfloat16)
    p = max_pool(z.astype(jnp.float32), 3)
    return batch_norm_infer(p, jnp.asarray(mean), jnp.asarray(var),
                            jnp.asarray(gamma), jnp.asarray(beta))


@pytest.mark.parametrize("b,h,w", [(2, 36, 128), (1, 144, 256), (3, 45, 96)])
def test_fused_conv1_matches_oracle(b, h, w):
    rng = np.random.default_rng(hash((b, h, w)) % 2**31)
    x = rng.integers(0, 256, size=(b, h, w, 3), dtype=np.uint8)
    k, bias, gamma, beta, mean, var = _params(rng)
    ref = np.asarray(_oracle(x, k, bias, gamma, beta, mean, var))
    got = np.asarray(fused_conv1_pool(
        jnp.asarray(x), jnp.asarray(k), jnp.asarray(bias),
        jnp.asarray(gamma), jnp.asarray(beta), jnp.asarray(mean),
        jnp.asarray(var), out_dtype=jnp.float32, interpret=True))
    assert got.shape == ref.shape == (b, h // 3, (w - 3) // 3 + 1, 48)
    # Same bf16 operands, f32 accumulation: only reduction-order ulps.
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-3)


def test_fused_conv1_prod_layer1_argmax_consistency():
    """With the real (folded) prod-net layer 1, kernel output feeds the
    rest of the stack to the same per-frame argmax as the shipped graph."""
    from cut_detection_tpu.models.assembly import (
        _glued_apply,
        fold_preprocess,
        load_default_net,
    )
    from cut_detection_tpu.models.frame_conv import apply_frame_conv

    net, _ = load_default_net(precision="bfloat16_full")
    bundle = fold_preprocess(net.bundle)
    p0 = bundle["conv"]["params"][0]
    s0 = bundle["conv"]["state"][0]
    rng = np.random.default_rng(3)
    x = rng.integers(0, 256, size=(4, 36, 64, 3), dtype=np.uint8)

    ref_logits = np.asarray(_glued_apply(
        bundle, jnp.asarray(x).astype(jnp.float32),
        conv_cfg=net.conv_cfg, linear_cfg=net.linear_cfg,
        compute_dtype=net.compute_dtype))

    l1 = fused_conv1_pool(jnp.asarray(x), p0["kernel"], p0["bias"],
                          p0["gamma"], p0["beta"], s0["mean"], s0["var"],
                          interpret=True)
    # Remaining layers through the shipped functional stack.
    feats, _ = apply_frame_conv(bundle["conv"]["params"][1:],
                                bundle["conv"]["state"][1:],
                                l1.astype(jnp.float32), net.conv_cfg,
                                compute_dtype=net.compute_dtype)
    from cut_detection_tpu.models.frame_conv import apply_frame_linear

    logits, _ = apply_frame_linear(bundle["linear"]["params"],
                                   bundle["linear"]["state"], feats,
                                   net.linear_cfg,
                                   compute_dtype=net.compute_dtype)
    logits = np.asarray(logits)
    assert (logits.argmax(1) == ref_logits.argmax(1)).all()
    assert np.abs(logits - ref_logits).max() < 0.05


def test_strip_rows_helper():
    assert _strip_rows_for(144) == 24
    assert _strip_rows_for(144, cap=48) == 48
    assert _strip_rows_for(36) == 18
    assert _strip_rows_for(45) == 15
    assert _strip_rows_for(90) == 18
    with pytest.raises(ValueError):
        _strip_rows_for(7)
