"""Pixel-major fused conv block (round 3) vs the ops/nn oracle.

CPU runs the kernel in interpreter mode; hardware numerics/throughput
are covered by scripts/bench_fused_conv1.py (stage ``mid``) and
docs/PERFORMANCE.md.  The kernel exists because the relay's Mosaic
toolchain dropped lane-strided loads (which the round-2 channel-major
kernels depended on); this layout needs only sublane-offset and
sublane-strided slices.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cut_detection_tpu.ops.nn import batch_norm_infer, max_pool
from cut_detection_tpu.ops.pallas.fused_block_pm import fused_conv_block_pm


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
def test_fused_block_pm_matches_oracle(b, h, w, cin, cout):
    rng = np.random.default_rng(hash((b, h, w, cin)) % 2**31)
    x = rng.normal(0, 1, size=(b, h, w, cin)).astype(np.float32)
    x = np.asarray(jnp.asarray(x).astype(jnp.bfloat16).astype(jnp.float32))
    k, bias, gamma, beta, mean, var = _params(rng, cin, cout)
    ref = np.asarray(_oracle(x, k, bias, gamma, beta, mean, var))
    got = np.asarray(fused_conv_block_pm(
        jnp.asarray(x), jnp.asarray(k), jnp.asarray(bias),
        jnp.asarray(gamma), jnp.asarray(beta), jnp.asarray(mean),
        jnp.asarray(var), out_dtype=jnp.float32, interpret=True))
    assert got.shape == ref.shape == (b, h // 3, (w - 3) // 3 + 1, cout)
    # Identical op order and operand dtypes; one big [M, 9cin]@[9cin,
    # cout] accumulation vs XLA's conv tree can differ by f32
    # summation-order rounding only.
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_fused_block_pm_chains_prod_shapes():
    """Layer-2 output feeds layer-3 directly (NHWC, no relayout), and
    the chained pair matches the chained oracle."""
    rng = np.random.default_rng(7)
    x = rng.normal(0, 1, size=(2, 48, 85, 48)).astype(np.float32)
    x = np.asarray(jnp.asarray(x).astype(jnp.bfloat16).astype(jnp.float32))
    p2 = _params(rng, 48, 48)
    p3 = _params(rng, 48, 48)
    ref = np.asarray(_oracle(np.asarray(_oracle(x, *p2), np.float32), *p3))
    a = fused_conv_block_pm(jnp.asarray(x), *map(jnp.asarray, p2),
                            out_dtype=jnp.float32, interpret=True)
    got = np.asarray(fused_conv_block_pm(a, *map(jnp.asarray, p3),
                                         out_dtype=jnp.float32,
                                         interpret=True))
    assert got.shape == (2, 5, 9, 48)
    np.testing.assert_allclose(got, ref, rtol=5e-5, atol=5e-5)
