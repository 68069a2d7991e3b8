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
                      "uint8_pool", "uint8_chain")}
    logits = {p: np.asarray(n(frames)) for p, n in nets.items()}
    # bf16 operand truncation moves logits by O(1e-2); class decisions on
    # non-borderline inputs must not move.
    assert np.abs(logits["float32"] - logits["bfloat16"]).max() < 0.1
    assert np.abs(logits["float32"] - logits["bfloat16_full"]).max() < 0.3
    # uint8_pool adds ~0.4% activation rounding per conv layer;
    # uint8_chain reorders the same affine (folded into the next conv)
    # so its rounding error has the same magnitude.
    assert np.abs(logits["float32"] - logits["uint8_pool"]).max() < 0.5
    assert np.abs(logits["float32"] - logits["uint8_chain"]).max() < 0.5
    for p in ("bfloat16", "bfloat16_full", "uint8_pool", "uint8_chain"):
        np.testing.assert_array_equal(logits["float32"].argmax(1),
                                      logits[p].argmax(1))


def test_int8_mxu_matches_float32_decisions(frames):
    """int8_mxu: int8 x int8 -> int32 convs with per-output-channel
    weight scales.  Weight rounding (~0.4%/channel) adds only marginally
    to the chain rung's activation rounding; class decisions on
    non-borderline inputs must not move.  Fed both ways: raw uint8
    frames (the production fold path, layer 1 int8) and dense float
    (the GluedNet contract, layer 1 bf16 fallback)."""
    f32 = load_default_net(precision="float32")[0]
    i8 = load_default_net(precision="int8_mxu")[0]
    ref = np.asarray(f32(frames))
    dense = np.asarray(i8(frames))
    assert np.abs(ref - dense).max() < 0.7
    np.testing.assert_array_equal(ref.argmax(1), dense.argmax(1))

    # Production path: fold + raw uint8 frames through _glued_apply.
    import jax
    import jax.numpy as jnp

    from cut_detection_tpu.models.assembly import _glued_apply, fold_preprocess

    u8 = (frames * 255.0).round().astype(np.uint8)
    for precision in ("float32", "int8_mxu"):
        net = load_default_net(precision=precision)[0]
        bundle = jax.tree_util.tree_map(jnp.asarray,
                                        fold_preprocess(net.bundle))
        x = u8 if precision == "int8_mxu" else u8.astype(np.float32)
        out = np.asarray(_glued_apply(bundle, x, conv_cfg=net.conv_cfg,
                                      linear_cfg=net.linear_cfg,
                                      compute_dtype=net.compute_dtype))
        if precision == "float32":
            ref_u8 = out
        else:
            assert np.abs(ref_u8 - out).max() < 0.7
            np.testing.assert_array_equal(ref_u8.argmax(1), out.argmax(1))


def test_int8_mxu_interlayer_tensor_is_int8():
    """The inter-layer activations are int8 and the convs accumulate in
    int32 in the jaxpr — no bf16 operand conversion anywhere on the
    conv path (the rung's reason to exist)."""
    import jax

    net = load_default_net(precision="int8_mxu")[0]
    x = np.zeros((2, 144, 256, 3), np.uint8)
    from cut_detection_tpu.models.assembly import _glued_apply, fold_preprocess

    bundle = fold_preprocess(jax.device_get(net.bundle))
    jaxpr = str(jax.make_jaxpr(
        lambda b, xx: _glued_apply(b, xx, conv_cfg=net.conv_cfg,
                                   linear_cfg=net.linear_cfg,
                                   compute_dtype="int8_mxu"))(bundle, x))
    for shape in ("i8[2,48,85,48]", "i8[2,16,28,48]", "i8[2,5,9,48]"):
        assert shape in jaxpr, shape
    # int32 conv outputs at the three pre-pool shapes.
    for shape in ("i32[2,144,256,48]", "i32[2,48,85,48]", "i32[2,16,28,48]"):
        assert shape in jaxpr, shape


def test_quantize_kernel_i8_roundtrip():
    """Per-output-channel symmetric quantization: reconstruction error
    bounded by scale/2 per weight; zero kernels survive (no div by 0)."""
    from cut_detection_tpu.ops.nn import quantize_kernel_i8

    rng = np.random.default_rng(5)
    k = rng.standard_normal((3, 3, 8, 16)).astype(np.float32)
    k[..., 0] = 0.0  # a dead output channel
    ki, s = quantize_kernel_i8(k)
    assert np.asarray(ki).dtype == np.int8
    recon = np.asarray(ki).astype(np.float32) * np.asarray(s)
    err = np.abs(recon - k)
    assert (err <= np.asarray(s)[None, None, None, :] / 2 + 1e-9).all()


def test_uint8_chain_deferred_affine_identity():
    """The uint8_chain weight fold is exact in real arithmetic:
    conv(q*a + b, W) == conv(q, W*diag(a)) + conv(b*ones, W), including
    the zero-padding border ring (models/layers.apply_conv_block_u8)."""
    import jax.numpy as jnp

    from cut_detection_tpu.ops.nn import conv2d_same

    rng = np.random.default_rng(3)
    q = rng.integers(0, 256, size=(2, 11, 13, 5)).astype(np.float32)
    a = rng.random(5, dtype=np.float32) + 0.1
    b = rng.standard_normal(5).astype(np.float32)
    w = rng.standard_normal((3, 3, 5, 7)).astype(np.float32)
    bias = rng.standard_normal(7).astype(np.float32)

    dense = conv2d_same(jnp.asarray(q * a + b), jnp.asarray(w),
                        jnp.asarray(bias))
    folded = conv2d_same(jnp.asarray(q), jnp.asarray(w * a[None, None, :,
                                                           None]))
    ring = conv2d_same(jnp.broadcast_to(jnp.asarray(b), (1, 11, 13, 5)),
                       jnp.asarray(w), jnp.asarray(bias))
    # Equal up to f32 summation-order rounding (different accumulation
    # trees for the two sides; observed rel diff <=5e-5 at |out|~700).
    np.testing.assert_allclose(np.asarray(folded + ring), np.asarray(dense),
                               rtol=2e-4, atol=1e-3)


def test_const_conv_ring_strip_matches_full_canvas():
    """The 3-row strip computation of the deferred-affine constant term
    is BIT-exact vs the full-canvas batch-1 conv it replaces (every
    output element is the same dot product over the same taps), across
    dtypes, odd/even heights, and the h<3 fallback path."""
    import jax.numpy as jnp

    from cut_detection_tpu.models.layers import const_conv_ring
    from cut_detection_tpu.ops.nn import conv2d_same

    rng = np.random.default_rng(7)
    for h, w_, cdt in [(11, 13, "float32"), (12, 9, "bfloat16_full"),
                       (3, 5, "float32"), (2, 5, "float32"),
                       (48, 85, "bfloat16_full")]:
        b = jnp.asarray(rng.standard_normal(5).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((3, 3, 5, 7)).astype(np.float32))
        bias = jnp.asarray(rng.standard_normal(7).astype(np.float32))
        full = conv2d_same(jnp.broadcast_to(b, (1, h, w_, 5)), k, bias,
                           compute_dtype=cdt)
        strip = const_conv_ring(b, k, bias, h, w_, compute_dtype=cdt)
        assert strip.shape == full.shape
        np.testing.assert_array_equal(np.asarray(strip), np.asarray(full))


def test_precompute_rings_bitexact_vs_in_graph():
    """assembly.precompute_rings replicates the blocks' affine chain via
    the shared pending-affine helpers, so logits computed with the
    precomputed ring constants are BIT-identical to the in-graph rings
    (this is what keeps the per-call fast path inside the golden-CSV
    byte-parity guarantee) — for both deferred-affine rungs, folded and
    unfolded, and at a non-model resolution."""
    import jax
    import jax.numpy as jnp

    from cut_detection_tpu.models.assembly import (
        _glued_apply,
        fold_preprocess,
        folded_input,
        load_default_net,
        precompute_rings,
    )

    rng = np.random.default_rng(11)
    for precision in ("uint8_chain", "int8_mxu"):
        net, _ = load_default_net(precision=precision)
        for h, w in [(144, 256), (72, 128)]:
            frames = jnp.asarray(rng.integers(0, 256, (3, h, w, 3),
                                              dtype=np.uint8))
            folded = jax.tree_util.tree_map(jnp.asarray,
                                            fold_preprocess(net.bundle))
            x = folded_input(frames, net.compute_dtype)
            rings = precompute_rings(net.bundle, net.conv_cfg, h, w,
                                     net.compute_dtype, fold=True)
            assert rings is not None and len(rings) == 3
            # int8_mxu's folded layer 1 consumes raw uint8 -> has a ring.
            assert (rings[0] is not None) == (precision == "int8_mxu")
            assert rings[1] is not None and rings[2] is not None
            base = _glued_apply(folded, x, conv_cfg=net.conv_cfg,
                                linear_cfg=net.linear_cfg,
                                compute_dtype=net.compute_dtype)
            fast = _glued_apply(folded, x, conv_cfg=net.conv_cfg,
                                linear_cfg=net.linear_cfg,
                                compute_dtype=net.compute_dtype,
                                rings=rings)
            np.testing.assert_array_equal(np.asarray(fast), np.asarray(base))

        # Unfolded graph (pallas-preprocess style): float input, layer 1
        # dense -> no layer-1 ring; mid-stack rings still apply.
        frames = jnp.asarray(rng.integers(0, 256, (2, 144, 256, 3),
                                          dtype=np.uint8))
        x = frames.astype(jnp.float32) / 255.0
        rings_nf = precompute_rings(net.bundle, net.conv_cfg, 144, 256,
                                    net.compute_dtype, fold=False)
        assert rings_nf[0] is None
        base = _glued_apply(net.bundle, x, conv_cfg=net.conv_cfg,
                            linear_cfg=net.linear_cfg,
                            compute_dtype=net.compute_dtype)
        fast = _glued_apply(net.bundle, x, conv_cfg=net.conv_cfg,
                            linear_cfg=net.linear_cfg,
                            compute_dtype=net.compute_dtype, rings=rings_nf)
        np.testing.assert_array_equal(np.asarray(fast), np.asarray(base))


def test_precompute_rings_none_for_dense_rungs():
    """Rungs without deferred-affine storage have no rings to precompute."""
    from cut_detection_tpu.models.assembly import load_default_net, precompute_rings

    net, _ = load_default_net(precision="bfloat16_full")
    assert precompute_rings(net.bundle, net.conv_cfg, 144, 256,
                            "bfloat16_full") is None
    assert precompute_rings(net.bundle, net.conv_cfg, 144, 256,
                            "float32") is None


def test_uint8_chain_interlayer_tensor_is_uint8():
    """The inter-layer activations really are uint8 in the jaxpr (the
    whole point of the rung: 1 B/elem HBM traffic between blocks)."""
    import jax

    net = load_default_net(precision="uint8_chain")[0]
    x = np.zeros((2, 144, 256, 3), np.float32)
    from cut_detection_tpu.models.assembly import _glued_apply

    jaxpr = jax.make_jaxpr(
        lambda b, xx: _glued_apply(b, xx, conv_cfg=net.conv_cfg,
                                   linear_cfg=net.linear_cfg,
                                   compute_dtype="uint8_chain"))(
        jax.device_get(net.bundle), x)
    # The pooled inter-block activations are uint8 at their exact
    # pooled shapes (256x144 input -> 85x48 -> 28x16 -> 9x5, 48ch).
    text = str(jaxpr)
    for shape in ("u8[2,48,85,48]", "u8[2,16,28,48]", "u8[2,5,9,48]"):
        assert shape in text, shape


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
