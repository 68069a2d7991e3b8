"""Experimental int8 quantized inference path.

v5e's MXU runs int8 at 2x the bf16 rate, and int8 activations halve the
HBM bytes again vs bf16 — the next rung below ``bfloat16_full`` on the
speed/accuracy ladder.  Scheme (per layer of the conv stack):

- **Weights**: symmetric per-output-channel int8
  (``w_q = round(w / s_w)``, ``s_w = max|w| / 127``), folded offline.
- **Layer 1 input**: the raw uint8 pixels map EXACTLY onto int8 with zero
  point -128 (``x_i8 = u8 - 128``): the reference's ``/255`` normalize
  folds into the dequant scale and the zero point becomes a precomputed
  per-channel correction ``128 * sum(w)`` — layer 1 adds no activation
  quantization error at all.  The BGR->RGB flip stays an index op.
- **Conv** in int8 -> int32 accumulation; bias is added in the int32
  domain (``round(bias / scale)``) so ReLU and the 3x3 max-pool also run
  in int32 (both commute with the positive dequant scale).
- **Dequant at BN** (per-channel scale folds with BN's scale/offset into
  one fused multiply-add), then **dynamic requantization** to int8 for
  the next layer (per-tensor ``s = max|y| / 127``, computed on device).
- The FC head stays bf16/f32 — it is a few thousand FLOPs.

Accuracy is measured, not assumed: max |Δlogit| ≈ 0.44 vs float, zero
argmax flips on test batches (tests/test_quantized.py).

**Status: measured, not competitive on this model.**  35.7k fps on the
v5e vs 66k for ``bfloat16_full``: the ReLU/max-pool stages run on int32
(4 B/elem — *more* HBM traffic than bf16's 2 B), the dynamic requant adds
full-tensor reduction + rounding passes, and XLA's int8 conv lowering
did not reach the MXU's 2x int8 rate here.  Kept as a tested experimental
op and a recorded data point (docs/PERFORMANCE.md); the shipping perf
mode remains ``bfloat16_full``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cut_detection_tpu.config import ConvNetConfig, LinearNetConfig
from cut_detection_tpu.models.frame_conv import apply_frame_linear
from cut_detection_tpu.ops.nn import BN_EPS, adaptive_avg_pool, flatten_nchw_order


def quantize_conv_layer(params: dict) -> dict:
    """Fold one conv layer's params into the int8 form.

    Returns {w_q int8 HWIO, s_w f32[co], bias f32[co], bn scale/offset
    f32[co]} — everything the quantized apply needs.
    """
    w = np.asarray(params["kernel"], np.float32)
    s_w = np.abs(w).reshape(-1, w.shape[3]).max(axis=0) / 127.0
    s_w = np.maximum(s_w, 1e-12)
    w_q = np.clip(np.rint(w / s_w), -127, 127).astype(np.int8)
    return {
        "w_q": w_q,
        "s_w": s_w.astype(np.float32),
        "bias": np.asarray(params["bias"], np.float32),
        "gamma": np.asarray(params.get("gamma"), np.float32)
        if "gamma" in params else None,
        "beta": np.asarray(params.get("beta"), np.float32)
        if "beta" in params else None,
    }


def quantize_bundle(bundle) -> dict:
    """Quantize the conv stack of a GluedNet bundle (head stays float)."""
    layers = []
    for p, s in zip(bundle["conv"]["params"], bundle["conv"]["state"]):
        q = quantize_conv_layer(p)
        q["bn_mean"] = np.asarray(s["mean"], np.float32)
        q["bn_var"] = np.asarray(s["var"], np.float32)
        # 128 * sum_w correction for the zero-point of layer 1's input.
        q["zp_corr"] = np.asarray(
            128.0 * q["w_q"].astype(np.int64).sum(axis=(0, 1, 2)),
            np.int32)
        layers.append(q)
    return {
        "conv_q": layers,
        "linear": bundle["linear"],
    }


def _conv_int8(x_i8, w_q):
    return jax.lax.conv_general_dilated(
        x_i8, w_q,
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )


def _max_pool_i32(x):
    return jax.lax.reduce_window(
        x, jnp.iinfo(jnp.int32).min, jax.lax.max,
        window_dimensions=(1, 3, 3, 1), window_strides=(1, 3, 3, 1),
        padding="VALID")


def quantized_glued_apply(qbundle, frames_u8_bgr, *, conv_cfg: ConvNetConfig,
                          linear_cfg: LinearNetConfig):
    """uint8 BGR NHWC frames -> logits, int8 conv stack.

    Matches the reference semantics (conv->ReLU->maxpool3->BN per layer,
    frameID/net.py:33-40) up to quantization error.
    """
    layers = qbundle["conv_q"]
    # BGR -> RGB flip, then exact int8 embedding of the pixels.
    x_i8 = (frames_u8_bgr[..., ::-1].astype(jnp.int32) - 128).astype(jnp.int8)

    x = None
    for i, q in enumerate(layers):
        w_q = jnp.asarray(q["w_q"])
        s_w = jnp.asarray(q["s_w"])
        if i == 0:
            # Input scale 1/255 (the /255 normalize), zero point -128.
            s_in = jnp.float32(1.0 / 255.0)
            acc = _conv_int8(x_i8, w_q) + jnp.asarray(q["zp_corr"])
        else:
            s_in = x_scale  # noqa: F821 - defined in previous iteration
            acc = _conv_int8(x_q, w_q)  # noqa: F821
        scale = s_in * s_w  # per-channel dequant scale, f32[co]
        # Bias in the int32 domain so ReLU+pool stay integer.
        bias_i = jnp.rint(jnp.asarray(q["bias"]) / scale).astype(jnp.int32)
        acc = jnp.maximum(acc + bias_i, 0)
        acc = _max_pool_i32(acc)
        # Dequant + BN folded into one multiply-add.
        bn_s = jnp.asarray(q["gamma"]) * jax.lax.rsqrt(
            jnp.asarray(q["bn_var"]) + BN_EPS)
        y = acc.astype(jnp.float32) * (scale * bn_s) + (
            jnp.asarray(q["beta"]) - jnp.asarray(q["bn_mean"]) * bn_s)
        if i + 1 < len(layers):
            # Dynamic per-tensor requantization for the next conv.
            x_scale = jnp.maximum(jnp.max(jnp.abs(y)), 1e-6) / 127.0
            x_q = jnp.clip(jnp.rint(y / x_scale), -127, 127).astype(jnp.int8)
        else:
            x = y

    x = adaptive_avg_pool(x, conv_cfg.average_pool_size)
    x = flatten_nchw_order(x)
    logits, _ = apply_frame_linear(qbundle["linear"]["params"],
                                   qbundle["linear"]["state"], x, linear_cfg,
                                   train=False, compute_dtype="bfloat16")
    return logits
