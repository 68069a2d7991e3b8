"""Building-block layers: conv block and FC block.

Reference semantics (frameID/net.py):

- ``CNNLayer``: conv3x3(pad 1) -> activation -> maxpool(k=3, stride 3) ->
  BatchNorm2d.  Note the *nonstandard order*: BN comes after pooling and
  after the activation (net.py:33-40).
- ``FCLayer``: linear -> activation -> BatchNorm1d (net.py:62-68).

Both blocks here are (init, apply) pairs over explicit pytrees.  Trainable
parameters and BN running statistics are kept in separate trees ("params"
vs "state") so training steps stay functional: ``apply(..., train=True)``
returns the updated state alongside the activations.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from cut_detection_tpu.ops.nn import (
    BN_EPS,
    batch_norm_infer,
    batch_norm_train,
    conv2d_same,
    conv2d_same_i8,
    linear,
    max_pool,
    quantize_kernel_i8,
)


# The reference's maxpool window AND stride (net.py:90-120: k=3 pool,
# stride 3 implied).  Single source of truth: the conv blocks below
# default to it, and assembly.precompute_rings walks per-layer ring
# shapes with the same constant — if the pool window ever becomes
# configurable, both must change together through this name.
POOL_WINDOW = 3


def _kaiming_uniform_bound(fan_in: int) -> float:
    """torch's default Conv2d/Linear weight init: kaiming_uniform(a=sqrt(5)),
    which works out to U(-sqrt(1/fan_in)*sqrt(3)... ) == U(+-1/sqrt(fan_in))
    scaled by sqrt(6/(1+5)) = 1; concretely bound = sqrt(6 / ((1+5)*fan_in))
    * ... — the closed form torch uses is ``1/sqrt(fan_in)`` for bias and
    ``sqrt(6/((1 + a^2) * fan_in)) = sqrt(1/fan_in)`` for weights with
    a=sqrt(5).  Both reduce to 1/sqrt(fan_in) up to a sqrt(3) factor on the
    weights; we reproduce torch's exact bounds below.
    """
    return math.sqrt(1.0 / fan_in)


def init_conv_block(key, in_ch: int, out_ch: int, *, kernel: int = 3,
                    batch_norm: bool = True, dtype=jnp.float32):
    """Init a CNNLayer-equivalent block.  Weight layout HWIO."""
    k_w, k_b = jax.random.split(key)
    fan_in = in_ch * kernel * kernel
    w_bound = math.sqrt(6.0 / ((1.0 + 5.0) * fan_in))  # kaiming_uniform a=sqrt(5)
    b_bound = _kaiming_uniform_bound(fan_in)
    params = {
        "kernel": jax.random.uniform(
            k_w, (kernel, kernel, in_ch, out_ch), dtype, -w_bound, w_bound
        ),
        "bias": jax.random.uniform(k_b, (out_ch,), dtype, -b_bound, b_bound),
    }
    state = {}
    if batch_norm:
        params["gamma"] = jnp.ones((out_ch,), dtype)
        params["beta"] = jnp.zeros((out_ch,), dtype)
        state = {"mean": jnp.zeros((out_ch,), dtype),
                 "var": jnp.ones((out_ch,), dtype)}
    return params, state


def apply_conv_block(params, state, x, *, train: bool = False,
                     pool_window: int = POOL_WINDOW, compute_dtype=None):
    """conv -> ReLU -> maxpool -> BN, exactly net.py:33-40's order.

    ``compute_dtype="uint8_pool"`` (eval only, needs BN): the fastest
    precision rung — conv runs like ``bfloat16_full`` but the post-ReLU
    activation is quantized to uint8 before the pool, so the conv
    output's HBM round trip (the pipeline's dominant traffic, 2 B/elem
    at bf16) shrinks to 1 B/elem.  Exactly valid because max pooling
    commutes with the monotonic per-channel quantization; the only
    error is the uint8 rounding of the pooled survivor (~0.4% of its
    channel's dynamic range).  Scales derive from the checkpoint's own
    BN running statistics (mean + 8*sigma of the pooled activation
    covers the pre-pool distribution's tail), so no calibration pass is
    needed and user-trained checkpoints work unchanged.  Accuracy is
    gated by the eval corpus + fixtures like the other fast modes, not
    byte-parity.
    """
    if str(compute_dtype) == "uint8_pool" and not train and "gamma" in params:
        z = conv2d_same(x, params["kernel"], params["bias"],
                        compute_dtype="bfloat16_full")
        z = jax.nn.relu(z).astype(jnp.float32)
        scale = conv_quantize_scale(state)
        q = jnp.clip(jnp.rint(z / scale), 0.0, 255.0).astype(jnp.uint8)
        p = max_pool(q, pool_window)
        x = p.astype(jnp.float32) * scale
        x = batch_norm_infer(x, state["mean"], state["var"],
                             params["gamma"], params["beta"])
        # bf16 inter-layer activations, matching bfloat16_full's traffic.
        return x.astype(jnp.bfloat16), state
    if str(compute_dtype) in ("uint8_pool", "uint8_chain", "int8_mxu"):
        compute_dtype = "bfloat16_full"  # train / BN-less fallback
    x = conv2d_same(x, params["kernel"], params["bias"],
                    compute_dtype=compute_dtype)
    x = jax.nn.relu(x)
    x = max_pool(x, pool_window)
    if "gamma" in params:
        if train:
            x, new_mean, new_var = batch_norm_train(
                x, state["mean"], state["var"], params["gamma"], params["beta"]
            )
            state = {"mean": new_mean, "var": new_var}
        else:
            x = batch_norm_infer(
                x, state["mean"], state["var"], params["gamma"], params["beta"]
            )
    return x, state


def conv_quantize_scale(state):
    """Per-channel uint8 quantization scale for a conv block's post-ReLU
    activation, derived from the checkpoint's own BN running statistics
    (mean + 8*sigma covers the pre-pool distribution's tail) — no
    calibration pass needed, user-trained checkpoints work unchanged."""
    scale = (state["mean"] + 8.0 * jnp.sqrt(state["var"] + BN_EPS)) / 255.0
    return jnp.maximum(scale.astype(jnp.float32), 1e-12)


def const_conv_ring(b, kernel, bias, h: int, w: int,
                    compute_dtype="bfloat16_full"):
    """``conv2d_same(b · 1[1,h,w,:], kernel, bias)`` without the full conv.

    The deferred-affine rungs' constant term ``conv(b*1, W) + bias`` is
    input-independent, and for a 3x3 'same' conv every interior row of a
    constant canvas is identical — only the top and bottom rows differ
    (zero-padding border).  Computing the full canvas as a batch-1 conv
    is NOT ~1/B of the batch conv's cost on TPU: measured 0.409 ms vs
    0.538 ms for the batch-128 conv at the mid-stack shape
    (scripts/probe_int8_stages.py) — batch-1 convs do not amortize on
    the MXU.  A 3-row strip + interior-row broadcast is exact (each
    output element is the same dot product over the same taps) and ~h/3
    cheaper.  Falls back to the full canvas for h < 3 or non-3x3 kernels.
    """
    c_in = b.shape[0]
    if h < 3 or kernel.shape[0] != 3 or kernel.shape[1] != 3:
        return conv2d_same(jnp.broadcast_to(b, (1, h, w, c_in)), kernel,
                           bias, compute_dtype=compute_dtype)
    strip = conv2d_same(jnp.broadcast_to(b, (1, 3, w, c_in)), kernel,
                        bias, compute_dtype=compute_dtype)
    mid = jnp.broadcast_to(strip[:, 1:2], (1, h - 2, w, strip.shape[3]))
    return jnp.concatenate([strip[:, 0:1], mid, strip[:, 2:3]], axis=1)


def u8_pending_affine(params, state):
    """The uint8_chain block's pending affine: dequant (*scale) composed
    with eval-mode BN (*s + t).  Pure function of the bundle — shared by
    the in-graph block and :func:`~..models.assembly.precompute_rings`
    so the two can never drift."""
    scale = conv_quantize_scale(state)
    s = params["gamma"] * jax.lax.rsqrt(state["var"] + BN_EPS)
    t = params["beta"] - state["mean"] * s
    return scale * s.astype(jnp.float32), t.astype(jnp.float32)


def i8_pending_affine(params, state):
    """int8_mxu's pending affine: uint8_chain's with the -128 storage
    shift folded into the bias (``dense = q*a + b`` with ``b += 128*a``)."""
    a, b = u8_pending_affine(params, state)
    return a, b + 128.0 * a


def apply_conv_block_u8(params, state, x, affine, *, pool_window: int = POOL_WINDOW,
                        ring=None):
    """One eval-mode conv block of the ``uint8_chain`` precision rung.

    Same math as the ``uint8_pool`` branch of :func:`apply_conv_block`
    (conv -> ReLU -> uint8 quantize -> maxpool -> BN; frameID/net.py:33-40
    order), but the dequantize+BN affine is NOT applied to the pooled
    activation — it is returned alongside the raw uint8 tensor and folded
    into the NEXT conv's weights:

        conv(q * a + b, W) == conv(q, W * diag(a)) + conv(b * 1, W)

    so the inter-layer HBM tensor is 1 B/elem instead of bf16's 2 B/elem
    (the dominant remaining traffic after the in-layer uint8 round trip;
    docs/PERFORMANCE.md).  The constant second term — exact including the
    zero-padding border ring, where edge pixels see fewer taps — is
    input-independent and computed as a 3-row strip (:func:`const_conv_ring`;
    a naive batch-1 canvas conv costs ~76% of the full batch conv on TPU).

    ``x`` is dense float for the first layer (``affine=None``) or the
    previous block's raw uint8 activation.  ``ring`` accepts the
    precomputed constant term (assembly.precompute_rings) — on TPU even
    a 3-row ring conv pays a ~0.4 ms small-conv latency floor per call
    (scripts/probe_ring_cost.py), so per-call paths pass it in as a
    resident tensor.  Returns ``(q, (a, b))``.
    """
    kernel = params["kernel"]
    if affine is None:
        z = conv2d_same(x, kernel, params["bias"],
                        compute_dtype="bfloat16_full")
    else:
        a, b = affine
        kq = kernel.astype(jnp.float32) * a[None, None, :, None]
        z = conv2d_same(x, kq, None, compute_dtype="bfloat16_full")
        if ring is None:
            ring = const_conv_ring(b, kernel, params["bias"],
                                   x.shape[1], x.shape[2])
        z = z + ring
    z = jax.nn.relu(z).astype(jnp.float32)
    scale = conv_quantize_scale(state)
    q = jnp.clip(jnp.rint(z / scale), 0.0, 255.0).astype(jnp.uint8)
    q = max_pool(q, pool_window)
    return q, u8_pending_affine(params, state)


def dequantize_u8(q, affine, dtype=jnp.bfloat16):
    """Materialize dense activations from a (q, (a, b)) pair."""
    a, b = affine
    return (q.astype(jnp.float32) * a + b).astype(dtype)


def apply_conv_block_i8(params, state, x, affine, *, pool_window: int = POOL_WINDOW,
                        ring=None):
    """One eval-mode conv block of the ``int8_mxu`` precision rung.

    Same deferred-affine chain as :func:`apply_conv_block_u8`, with two
    changes that remove uint8_chain's measured cap (the materialized
    uint8->bf16 operand conversion, docs/PERFORMANCE.md):

    - activations are stored as **int8** (the uint8 code shifted by
      -128; max pooling commutes with the monotonic shift), so the next
      conv consumes them directly — no conversion tensor; the shift
      folds into the pending affine's bias: ``dense = q*a + b`` with
      ``b += 128*a``;
    - the conv itself runs int8 x int8 -> int32 on the MXU with
      per-output-channel weight scales (``quantize_kernel_i8``) — exact
      integer accumulation; weight rounding (~0.4% per channel) is the
      rung's ONLY approximation beyond uint8_chain, accuracy-gated like
      the other fast rungs.

    First layer: ``affine=None`` with uint8 frames (preprocess folded
    into the kernel) runs int8 too via ``x = (x_u8 - 128) + 128*1``;
    a dense float first input falls back to the bf16 conv.
    Returns ``(q_i8, (a, b))``.
    """
    kernel = params["kernel"].astype(jnp.float32)
    if affine is None and x.dtype != jnp.uint8:
        z = conv2d_same(x, kernel, params["bias"],
                        compute_dtype="bfloat16_full")
    else:
        if affine is None:
            # Raw uint8 pixels: represent as int8 + constant 128.
            a = jnp.ones((kernel.shape[2],), jnp.float32)
            b = jnp.full((kernel.shape[2],), 128.0, jnp.float32)
            bias = params["bias"]
            x = (x.astype(jnp.int32) - 128).astype(jnp.int8)
        else:
            a, b = affine
            bias = params["bias"]
        kq = kernel * a[None, None, :, None]
        kq_i8, so = quantize_kernel_i8(kq)
        zi = conv2d_same_i8(x, kq_i8)
        # Constant term conv(b*1, W) + bias — exact on the zero-padding
        # border ring (edge pixels see fewer taps), strip-computed here
        # or precomputed per shape (assembly.precompute_rings).
        if ring is None:
            ring = const_conv_ring(b, kernel, bias, x.shape[1], x.shape[2])
        z = zi.astype(jnp.float32) * so + ring.astype(jnp.float32)
    z = jax.nn.relu(z)
    scale = conv_quantize_scale(state)
    q = jnp.clip(jnp.rint(z / scale) - 128.0, -128.0, 127.0).astype(jnp.int8)
    q = max_pool(q, pool_window)
    return q, i8_pending_affine(params, state)


def init_fc_block(key, in_f: int, out_f: int, *, batch_norm: bool = True,
                  dtype=jnp.float32):
    """Init an FCLayer-equivalent block.  Weight layout [in, out]."""
    k_w, k_b = jax.random.split(key)
    w_bound = math.sqrt(6.0 / ((1.0 + 5.0) * in_f))
    b_bound = _kaiming_uniform_bound(in_f)
    params = {
        "kernel": jax.random.uniform(k_w, (in_f, out_f), dtype, -w_bound, w_bound),
        "bias": jax.random.uniform(k_b, (out_f,), dtype, -b_bound, b_bound),
    }
    state = {}
    if batch_norm:
        params["gamma"] = jnp.ones((out_f,), dtype)
        params["beta"] = jnp.zeros((out_f,), dtype)
        state = {"mean": jnp.zeros((out_f,), dtype),
                 "var": jnp.ones((out_f,), dtype)}
    return params, state


def apply_fc_block(params, state, x, *, relu: bool, train: bool = False,
                   compute_dtype=None):
    """linear -> activation -> BN (net.py:62-68).

    ``relu=False`` gives the identity activation used by the final layer of
    FrameLinearNet (net.py:166).
    """
    x = linear(x, params["kernel"], params["bias"],
               compute_dtype=compute_dtype)
    if relu:
        x = jax.nn.relu(x)
    if "gamma" in params:
        if train:
            x, new_mean, new_var = batch_norm_train(
                x, state["mean"], state["var"], params["gamma"], params["beta"]
            )
            state = {"mean": new_mean, "var": new_var}
        else:
            x = batch_norm_infer(
                x, state["mean"], state["var"], params["gamma"], params["beta"]
            )
    return x, state
