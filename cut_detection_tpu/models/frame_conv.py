"""FrameConvNet / FrameLinearNet equivalents as pure functions.

Reference: frameID/net.py:71-189.

- ``FrameConvNet``: N conv blocks (first in_ch->hidden, rest hidden->hidden,
  all conv3x3 pad 1 + maxpool3 + BN), then AdaptiveAvgPool2d(avg_pool_size)
  and a flatten (net.py:90-133).
- ``FrameLinearNet``: n_layers FC blocks; hidden layers ReLU+BN, final layer
  identity activation without BN (net.py:160-186).

All activations are NHWC.  The flatten reproduces torch's NCHW channel-major
feature order so converted linear weights line up
(see ops.nn.flatten_nchw_order).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cut_detection_tpu.config import ConvNetConfig, LinearNetConfig
from cut_detection_tpu.models.layers import (
    apply_conv_block,
    apply_fc_block,
    init_conv_block,
    init_fc_block,
)
from cut_detection_tpu.ops.nn import adaptive_avg_pool, flatten_nchw_order


def init_frame_conv(key, cfg: ConvNetConfig, dtype=jnp.float32):
    """Init (params, state) pytrees: a list per conv block."""
    keys = jax.random.split(key, cfg.n_conv_layers)
    params, state = [], []
    in_ch = cfg.input_channels
    for i in range(cfg.n_conv_layers):
        p, s = init_conv_block(keys[i], in_ch, cfg.hidden_channels, dtype=dtype)
        params.append(p)
        state.append(s)
        in_ch = cfg.hidden_channels
    return params, state


def apply_frame_conv(params, state, x, cfg: ConvNetConfig, *,
                     train: bool = False, compute_dtype=None,
                     fused_frontend: bool = False, rings=None):
    """x: [B, H, W, C] -> features [B, hidden * pool^2]; returns (y, state).

    ``compute_dtype="bfloat16"`` runs the convolutions on the MXU in bf16
    with float32 accumulation (activations/BN stay float32).
    ``fused_frontend`` replaces layer 1 (conv+relu+pool+BN) with the
    space-to-depth matmul (ops/fused_frontend.py) — eval-mode only, used by
    the bf16 perf paths where float reassociation is already accepted.
    ``rings`` (deferred-affine rungs only): per-layer precomputed constant
    terms from assembly.precompute_rings; None entries compute in-graph.
    """
    if str(compute_dtype) in ("uint8_chain", "int8_mxu") and not train \
            and all("gamma" in p for p in params):
        # Deferred-affine quantized storage: raw uint8/int8 pooled
        # activations between blocks, dequant+BN folded into the next
        # conv's weights (layers.apply_conv_block_u8 / _i8; int8_mxu
        # additionally runs the convs as int8 x int8 -> int32 on the
        # MXU).  Eval-only; requires BN in every block (the scales
        # derive from its running stats).
        from cut_detection_tpu.models.layers import (
            apply_conv_block_i8,
            apply_conv_block_u8,
            dequantize_u8,
        )

        block = (apply_conv_block_i8 if str(compute_dtype) == "int8_mxu"
                 else apply_conv_block_u8)
        affine = None
        ring_list = list(rings) if rings is not None else [None] * len(params)
        for p, s, r in zip(params, state, ring_list):
            x, affine = block(p, s, x, affine, ring=r)
        x = dequantize_u8(x, affine)
        x = adaptive_avg_pool(x, cfg.average_pool_size)
        x = flatten_nchw_order(x)
        return x, list(state)

    new_state = []
    layers = list(zip(params, state))
    start = 0
    if fused_frontend and not train and x.shape[1] >= 3 and x.shape[2] >= 3:
        from cut_detection_tpu.ops.fused_frontend import conv1_maxpool_fused

        p, s = layers[0]
        x = conv1_maxpool_fused(x, p["kernel"], p["bias"], s["mean"],
                                s["var"], p["gamma"], p["beta"],
                                compute_dtype=compute_dtype)
        new_state.append(s)
        start = 1
    for p, s in layers[start:]:
        x, s = apply_conv_block(p, s, x, train=train,
                                compute_dtype=compute_dtype)
        new_state.append(s)
    x = adaptive_avg_pool(x, cfg.average_pool_size)
    x = flatten_nchw_order(x)
    return x, new_state


def init_frame_linear(key, cfg: LinearNetConfig, dtype=jnp.float32):
    sizes = cfg.layer_sizes()
    keys = jax.random.split(key, len(sizes))
    params, state = [], []
    for i, (in_f, out_f) in enumerate(sizes):
        final = i == len(sizes) - 1
        p, s = init_fc_block(keys[i], in_f, out_f, batch_norm=not final,
                             dtype=dtype)
        params.append(p)
        state.append(s)
    return params, state


def apply_frame_linear(params, state, x, cfg: LinearNetConfig, *,
                       train: bool = False, compute_dtype=None):
    """x: [B, input_size] -> [B, output_size]; returns (y, state)."""
    new_state = []
    n = len(params)
    for i, (p, s) in enumerate(zip(params, state)):
        final = i == n - 1
        x, s = apply_fc_block(p, s, x, relu=not final, train=train,
                              compute_dtype=compute_dtype)
        new_state.append(s)
    return x, new_state


def num_params(params) -> int:
    """Trainable parameter count (net.py:135-136, 188-189)."""
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))
