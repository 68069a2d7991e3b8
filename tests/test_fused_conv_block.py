"""Fused mid-stack conv block (C_in>=8) vs the ops/nn oracle.

CPU runs the kernel in interpreter mode; hardware numerics/throughput
are covered by scripts/bench_fused_conv1.py and docs/PERFORMANCE.md.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cut_detection_tpu.ops.nn import batch_norm_infer, max_pool
from cut_detection_tpu.ops.pallas.fused_conv_block import fused_conv_block


def _params(rng, cin, cout):
    return (
        rng.normal(0, 0.1, size=(3, 3, cin, cout)).astype(np.float32),
        rng.normal(0, 0.1, cout).astype(np.float32),
        rng.normal(1, 0.1, cout).astype(np.float32),
        rng.normal(0, 0.1, cout).astype(np.float32),
        rng.normal(0, 0.5, cout).astype(np.float32),
        rng.uniform(0.5, 2, cout).astype(np.float32),
    )


def _oracle(x, k, bias, gamma, beta, mean, var):
    """bfloat16_full-numerics CNNLayer through the shipped ops."""
    conv = jax.lax.conv_general_dilated(
        jnp.asarray(x).astype(jnp.bfloat16),
        jnp.asarray(k).astype(jnp.bfloat16),
        (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    z = jnp.maximum(conv + bias, 0).astype(jnp.bfloat16)
    p = max_pool(z.astype(jnp.float32), 3)
    return batch_norm_infer(p, jnp.asarray(mean), jnp.asarray(var),
                            jnp.asarray(gamma), jnp.asarray(beta))


@pytest.mark.parametrize("b,h,w,cin,cout", [
    (2, 48, 85, 48, 48),   # prod layer 2 shape
    (2, 16, 28, 48, 48),   # prod layer 3 shape (h%3 != 0: floor pooling)
    (1, 36, 40, 8, 16),    # rectangular channel counts
    (1, 10, 9, 8, 8),      # tiny, h%3 == 1
])
def test_fused_conv_block_matches_oracle(b, h, w, cin, cout):
    rng = np.random.default_rng(hash((b, h, w, cin)) % 2**31)
    x = rng.normal(0, 1, size=(b, h, w, cin)).astype(np.float32)
    x = np.asarray(jnp.asarray(x).astype(jnp.bfloat16).astype(jnp.float32))
    k, bias, gamma, beta, mean, var = _params(rng, cin, cout)
    ref = np.asarray(_oracle(x, k, bias, gamma, beta, mean, var))
    got = np.asarray(fused_conv_block(
        jnp.asarray(x), jnp.asarray(k), jnp.asarray(bias),
        jnp.asarray(gamma), jnp.asarray(beta), jnp.asarray(mean),
        jnp.asarray(var), out_dtype=jnp.float32, interpret=True))
    assert got.shape == ref.shape == (b, h // 3, (w - 3) // 3 + 1, cout)
    # Same bf16 operands, f32 accumulation — but the kernel accumulates
    # 9 per-tap dots where the oracle contracts all 9*cin taps at once,
    # so an f32 sum near a bf16 rounding boundary can land one bf16 ulp
    # away after the post-ReLU cast (2^-8 relative).  Allow exactly that.
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-2)
    close = np.isclose(got, ref, atol=3e-4, rtol=3e-3)
    assert close.mean() > 0.999


def test_fused_block_prod_layers23_argmax_consistency():
    """Layers 2 and 3 through the fused kernel (prod weights, incl. the
    16-row floor-pooled layer-3 input) feed the FC head to the same
    per-frame argmax as the shipped graph."""
    from cut_detection_tpu.models.assembly import (
        _glued_apply,
        fold_preprocess,
        load_default_net,
    )
    from cut_detection_tpu.models.frame_conv import apply_frame_linear
    from cut_detection_tpu.models.layers import apply_conv_block
    from cut_detection_tpu.ops.nn import adaptive_avg_pool, flatten_nchw_order

    net, _ = load_default_net(precision="bfloat16_full")
    bundle = fold_preprocess(net.bundle)
    cparams, cstate = bundle["conv"]["params"], bundle["conv"]["state"]
    rng = np.random.default_rng(5)
    x = rng.integers(0, 256, size=(4, 144, 256, 3), dtype=np.uint8)
    xf = jnp.asarray(x).astype(jnp.float32)

    ref_logits = np.asarray(_glued_apply(
        bundle, xf, conv_cfg=net.conv_cfg, linear_cfg=net.linear_cfg,
        compute_dtype=net.compute_dtype))

    acts, _ = apply_conv_block(cparams[0], cstate[0], xf, train=False,
                               compute_dtype=net.compute_dtype)
    for p, s in zip(cparams[1:], cstate[1:]):
        acts = fused_conv_block(acts, p["kernel"], p["bias"], p["gamma"],
                                p["beta"], s["mean"], s["var"],
                                interpret=True)
    feats = flatten_nchw_order(adaptive_avg_pool(
        acts.astype(jnp.float32), net.conv_cfg.average_pool_size))
    logits, _ = apply_frame_linear(bundle["linear"]["params"],
                                   bundle["linear"]["state"], feats,
                                   net.linear_cfg,
                                   compute_dtype=net.compute_dtype)
    logits = np.asarray(logits)
    assert (logits.argmax(1) == ref_logits.argmax(1)).all()
    assert np.abs(logits - ref_logits).max() < 0.05
