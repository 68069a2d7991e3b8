"""Core neural-net ops in NHWC with torch-matching numerics.

The reference model (frameID/net.py) is built from torch modules:

- ``nn.Conv2d(k=3, padding=1)``                      (net.py:24, 93-99)
- ``nn.MaxPool2d(kernel_size=3)``  -> stride 3, floor (net.py:26, 99)
- ``nn.BatchNorm2d`` / ``nn.BatchNorm1d``            (net.py:29, 58)
- ``nn.AdaptiveAvgPool2d(average_pool_size)``        (net.py:88)
- ``nn.Linear``                                      (net.py:54)

This module provides each as a pure NHWC function.  Layout notes:

- Activations: ``[B, H, W, C]`` (channels on the TPU lane dimension).
- Conv kernels: ``HWIO``.  The checkpoint converter transposes torch's
  ``OIHW`` weights (see cut_detection_tpu/checkpoint/convert.py).
- Linear weights: ``[in, out]`` (transposed from torch's ``[out, in]``),
  so the matmul is a plain ``x @ w`` on the MXU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# torch BatchNorm default eps (both 1d and 2d variants).
BN_EPS = 1e-5
# torch BatchNorm default momentum for running-stat updates.
BN_MOMENTUM = 0.1


def conv2d_same(x, kernel, bias=None, *, precision=None, compute_dtype=None):
    """3x3 'same' convolution, NHWC x HWIO -> NHWC.

    Matches ``nn.Conv2d(in, out, kernel_size=3, padding=1)`` from
    frameID/net.py:24 (stride 1, zero padding 1 on both spatial dims).

    Precision modes:

    - ``compute_dtype=None``: ``Precision.HIGHEST`` — on TPU the DEFAULT
      precision already truncates f32 operands to bf16 on the MXU, so
      "float32 mode" must request the multi-pass f32 algorithm explicitly
      to honor the <1e-4 reference-parity gate.
    - ``"bfloat16"``: bf16 MXU operands, float32 accumulation AND float32
      activations (HBM traffic unchanged).
    - ``"bfloat16_full"``: bf16 operands and bf16 activations — halves the
      HBM traffic of the activation tensors, the fastest path.
    """
    out_dtype = jnp.float32
    if compute_dtype is not None:
        x = x.astype(jnp.bfloat16)
        kernel = kernel.astype(jnp.bfloat16)
        if str(compute_dtype) == "bfloat16_full":
            out_dtype = jnp.bfloat16
    elif precision is None:
        precision = jax.lax.Precision.HIGHEST
    out = jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision,
        preferred_element_type=out_dtype,
    )
    if bias is not None:
        out = out + bias.astype(out_dtype)
    return out


def conv2d_same_i8(x_i8, kernel_i8):
    """3x3 'same' convolution with int8 operands, exact int32 accumulation.

    The MXU runs int8 matmuls at 2x its bf16 rate (v5e: 394 vs 197
    TOPS), and — the actual motivation (docs/PERFORMANCE.md: uint8_chain
    is capped by the materialized uint8->bf16 operand conversion) — an
    int8 conv consumes the quantized activation DIRECTLY from HBM with
    no conversion tensor at all.  int8 x int8 -> int32 is exact, so the
    rung's only approximation is the per-output-channel weight
    quantization (quantize_kernel_i8).
    """
    return jax.lax.conv_general_dilated(
        x_i8,
        kernel_i8,
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )


def quantize_kernel_i8(kernel):
    """Per-output-channel symmetric int8 weight quantization.

    ``kernel ~= kernel_i8 * scale[None, None, None, :]`` with scale =
    amax/127 per output channel — the standard symmetric scheme; worst-
    case representation error is scale/2 (~0.4% of the channel's weight
    range), the ``int8_mxu`` rung's only source of logit deviation.
    """
    kernel = kernel.astype(jnp.float32)
    amax = jnp.max(jnp.abs(kernel), axis=(0, 1, 2))
    scale = jnp.maximum(amax / 127.0, 1e-12).astype(jnp.float32)
    k_i8 = jnp.clip(jnp.rint(kernel / scale), -127, 127).astype(jnp.int8)
    return k_i8, scale


def max_pool(x, window: int = 3, stride: int | None = None):
    """Max pooling, floor mode, NHWC.

    ``nn.MaxPool2d(kernel_size=3)`` (frameID/net.py:26,99) implies
    ``stride == kernel_size``, no padding, floor division of the spatial
    dims — i.e. trailing rows/cols that don't fill a full window are
    dropped.  ``reduce_window`` with VALID padding matches that exactly.
    """
    if stride is None:
        stride = window
    # NOTE (round 3, measured-and-rejected): a slice+reshape+max
    # decomposition (exactly floor-mode pooling) benchmarked 2.7x
    # faster than reduce_window on uint8 STANDALONE
    # (scripts/probe_u8chain.py) — but swapping it in collapsed the
    # full uint8 rungs 112k -> 52k fps (bf16_full unchanged at 81k in
    # the same window, so not chip drift): in-graph, the reshape forces
    # a layout pass on the conv's uint8 output that costs far more than
    # the pool saves, the same failure mode as round 2's bf16
    # fusible-pool recast (docs/PERFORMANCE.md).  reduce_window stays.
    # Plain literal init keeps reduce_window on the max-pool autodiff path
    # (select-and-scatter VJP); a traced init value breaks linearization.
    # Integer inputs (the uint8_pool precision rung) use the dtype's min.
    init = (np.asarray(jnp.iinfo(x.dtype).min, dtype=x.dtype)[()]
            if jnp.issubdtype(x.dtype, jnp.integer) else -jnp.inf)
    return jax.lax.reduce_window(
        x,
        init,
        jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding="VALID",
    )


@functools.lru_cache(maxsize=None)
def _adaptive_pool_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Averaging matrix ``P`` with ``P[i, j] = 1/len(bin_i)`` for j in bin_i.

    torch's ``AdaptiveAvgPool2d`` defines bin ``i`` over input indices
    ``[floor(i * in / out), ceil((i + 1) * in / out))`` — bins may overlap
    (e.g. 5 -> 4 pooling reuses interior rows).  Expressing the pool as a
    dense matmul keeps the op on the MXU and is exact.
    """
    mat = np.zeros((out_size, in_size), dtype=np.float32)
    for i in range(out_size):
        start = (i * in_size) // out_size
        end = -((-(i + 1) * in_size) // out_size)  # ceil
        mat[i, start:end] = 1.0 / (end - start)
    return mat


def adaptive_pool_matrices(h: int, w: int, out_size: int):
    """Return the (row, col) pooling matrices for ``adaptive_avg_pool``."""
    return (
        jnp.asarray(_adaptive_pool_matrix(h, out_size)),
        jnp.asarray(_adaptive_pool_matrix(w, out_size)),
    )


def adaptive_avg_pool(x, out_size: int):
    """``nn.AdaptiveAvgPool2d(out_size)`` on NHWC input (frameID/net.py:88).

    Implemented as two small matmuls (rows then cols): for the prod model the
    input is [B, 5, 9, 48] and the output [B, 4, 4, 48], so this is tiny; the
    matmul form exists because it is shape-static, exact wrt torch's
    overlapping-bin semantics, and fuses cleanly under XLA.
    """
    h, w = x.shape[1], x.shape[2]
    ph, pw = adaptive_pool_matrices(h, w, out_size)
    # [B,H,W,C] -> rows: contract H with ph^T -> [B,out,W,C].  Tiny
    # contractions — run them at HIGHEST so TPU default bf16 truncation
    # can't leak into the pooled features.
    hi = jax.lax.Precision.HIGHEST
    x = jnp.einsum("bhwc,oh->bowc", x, ph, precision=hi)
    x = jnp.einsum("bhwc,ow->bhoc", x, pw, precision=hi)
    return x


def flatten_nchw_order(x):
    """Flatten NHWC activations to [B, C*H*W] in torch's NCHW order.

    The reference flattens the avg-pooled NCHW tensor with
    ``torch.reshape(x, [x.shape[0], -1])`` (frameID/net.py:131), producing
    features ordered c-major: ``index = c * (H*W) + h * W + w``.  The linear
    head's weights are laid out against that order, so we transpose before
    flattening.  The tensor at this point is [B, 4, 4, 48] — negligible cost.
    """
    b = x.shape[0]
    return jnp.transpose(x, (0, 3, 1, 2)).reshape(b, -1)


def batch_norm_infer(x, mean, var, gamma, beta, eps: float = BN_EPS):
    """Eval-mode batch norm using running statistics.

    Matches torch ``BatchNorm{1,2}d.eval()``: normalize with the stored
    ``running_mean``/``running_var`` (frameID/net.py:29,58; the prod
    checkpoints ship running stats).  The scale/offset form below is the
    standard eval-mode folding: ``y = x * s + t`` with
    ``s = gamma / sqrt(var + eps)``, ``t = beta - mean * s``.  Broadcasts
    over leading dims, so it serves both the 2d (NHWC) and 1d ([B, F]) cases.
    """
    s = gamma * jax.lax.rsqrt(var + eps)
    t = beta - mean * s
    # Scale/offset follow the activation dtype so a bf16 activation path
    # stays bf16 (s/t are computed in the params' f32 first).
    return x * s.astype(x.dtype) + t.astype(x.dtype)


def batch_norm_train(x, mean_running, var_running, gamma, beta,
                     eps: float = BN_EPS, momentum: float = BN_MOMENTUM):
    """Train-mode batch norm; returns (y, new_running_mean, new_running_var).

    torch semantics: normalization uses the *biased* batch variance, while
    the running-variance update uses the *unbiased* estimate
    (Bessel-corrected), with ``running = (1 - momentum) * running +
    momentum * batch_stat``.  Reduction axes are every dim except the last
    (channels/features), covering both BatchNorm2d on NHWC and BatchNorm1d
    on [B, F].
    """
    axes = tuple(range(x.ndim - 1))
    count = 1
    for a in axes:
        count *= x.shape[a]
    # Statistics and normalization always run in f32 (an f32 island for
    # bf16 mixed-precision training; a no-op for f32 inputs), with the
    # output cast back so the surrounding dtype region stays uniform —
    # JAX's conv/dot VJPs require matching operand/cotangent dtypes.
    in_dtype = x.dtype
    xf = x.astype(jnp.float32)
    batch_mean = jnp.mean(xf, axis=axes)
    batch_var = jnp.mean(jnp.square(xf - batch_mean), axis=axes)  # biased
    y = (xf - batch_mean) * jax.lax.rsqrt(batch_var + eps) \
        * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    correction = count / max(count - 1, 1)
    new_mean = (1 - momentum) * mean_running + momentum * batch_mean
    new_var = (1 - momentum) * var_running + momentum * batch_var * correction
    return y.astype(in_dtype), new_mean, new_var


def linear(x, weight, bias=None, *, compute_dtype=None):
    """``nn.Linear`` with weights stored [in, out] (frameID/net.py:54).

    Same precision contract as ``conv2d_same``: bf16 operands on request,
    otherwise explicit HIGHEST so TPU f32 really is f32.  (FC activations
    are tiny, so even ``bfloat16_full`` keeps float32 outputs here.)
    """
    if compute_dtype is not None:
        x = x.astype(jnp.bfloat16)
        weight = weight.astype(jnp.bfloat16)
        precision = None
    else:
        precision = jax.lax.Precision.HIGHEST
    out = jnp.dot(x, weight, preferred_element_type=jnp.float32,
                  precision=precision)
    if bias is not None:
        out = out + bias
    return out
