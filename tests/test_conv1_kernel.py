"""Fused conv1+pool Pallas kernel parity tests (interpret mode).

The kernel is a recorded experiment (rejected on measured throughput —
see its module docstring); these tests keep it correct so future layout
work can build on it.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from cut_detection_tpu.models.assembly import fold_preprocess, load_default_net
from cut_detection_tpu.models.layers import apply_conv_block
from cut_detection_tpu.ops.pallas.conv1_kernel import conv1_pool_fused, pack_w27


@pytest.fixture(scope="module")
def layer1():
    net, _ = load_default_net()
    fb = fold_preprocess(jax.device_get(net.bundle))
    return fb["conv"]["params"][0], fb["conv"]["state"][0]


def test_pack_w27_layout():
    rng = np.random.default_rng(0)
    k = rng.standard_normal((3, 3, 3, 4)).astype(np.float32)
    w = np.asarray(pack_w27(k))
    assert w.shape == (27, 4)
    np.testing.assert_array_equal(w[(1 * 3 + 2) * 3 + 0], k[1, 2, 0])


@pytest.mark.parametrize("h,w", [(144, 256), (36, 64)])
def test_fused_kernel_matches_conv_block(layer1, h, w):
    p0, s0 = layer1
    rng = np.random.default_rng(h)
    x_u8 = rng.integers(0, 256, size=(2, h, w, 3), dtype=np.uint8)
    with pltpu.force_tpu_interpret_mode():
        fused = np.asarray(conv1_pool_fused(
            jnp.asarray(x_u8), p0["kernel"], p0["bias"], s0["mean"],
            s0["var"], p0["gamma"], p0["beta"]))
    ref, _ = apply_conv_block(p0, s0, jnp.asarray(x_u8, jnp.float32),
                              train=False)
    assert fused.shape == np.asarray(ref).shape
    np.testing.assert_allclose(fused, np.asarray(ref), atol=1e-4)
