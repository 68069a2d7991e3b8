"""Fused mid-stack Mosaic kernel: conv3x3 (C_in>=8) + ReLU + maxpool3 + BN.

Companion to ops/pallas/fused_conv1.py (layer 1, C_in=3).  Once layer 1
is fused, layers 2/3's conv activations become the pipeline's largest
remaining HBM round trip (layer 2 writes + re-reads a [48, 85, 48] bf16
tensor per frame around the pool).  This kernel keeps that tensor in
VMEM: activations stream in, pooled+BN'd activations stream out.

Layout (one image per grid step, all in VMEM, channel-major — the MXU's
native orientation, matching fused_conv1's third-iteration design):

- Input is channel-major flat ``[C, G + (H+2)*ws + G]`` bf16 —
  sublanes = channels, lanes = flattened pixels with row stride
  ``ws = 3*ceil((W+1)/3)`` whose zero pad lanes double as the conv's x
  padding, bracketed by ``G=8`` zero guard lanes so the dx+-1 tap
  offsets of the first/last pixel never under/overrun.
- im2col assembly: every conv tap (dy, dx) of a row strip is ONE
  lane-shifted slice ``[C, m]`` copied into sublane block
  ``A[(dy*3+dx)*C : +C, :]`` — 9 vectorized copies per strip, no
  per-pixel work.
- One native-orientation MXU contraction per strip:
  ``W [C_out, 9C] @ A [9C, m]`` (bf16 x bf16, f32 accumulate).
- ReLU + bf16 activation rounding carried in f32 (strided loads only
  support 32-bit data; bf16 values are exact in f32 so pooling the
  rounded values is bit-identical), maxpool 3x3/3 as an elementwise max
  of the three stride-3 lane phases (``tpu.strided_load``) then of
  three contiguous row blocks per pooled row, then the eval-BN affine.
- Output channel-major ``[C_out, out_h*out_w]``; the wrapper exposes
  NHWC via one XLA transpose, or chained fused blocks consume
  channel-major directly.

Matches CNNLayer's exact op order — conv(pad 1) -> ReLU -> maxpool(3,3)
-> eval BatchNorm (frameID/net.py:33-40) — at bfloat16_full numerics.
Floor-mode pooling (torch MaxPool2d, frameID/net.py:26) supports
``H % 3 != 0``: conv row h_eff-1 still reads input row h_eff.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cut_detection_tpu.ops.nn import BN_EPS

_GUARD = 8  # leading zero lanes so tap offset dx-1 never underruns


def _kernel(x_ref, w_ref, bias_ref, scale_ref, offset_ref, out_ref,
            a_ref, z_ref, v_ref, *, h: int, h_eff: int, w: int, ws: int,
            strip_rows: int, out_w: int, cin: int, cout: int, out_dtype,
            interpret: bool = False):
    """One image per grid step.

    x_ref:    [1, cin, G + (h+2)*ws + G] bf16 (channel-major, H
              zero-padded 1 top/bottom, rows stride ws, pads zero)
    w_ref:    [cout, 9*cin] bf16 (taps k = (dy*3+dx)*cin + c)
    bias/scale/offset: [cout, 1] f32
    out_ref:  [1, cout, (h//3)*out_w] out_dtype (channel-major rows)
    a_ref:    [9*cin, strip_rows*ws] bf16 scratch (strip im2col matrix)
    z_ref:    [cout, strip_rows*ws] f32 scratch (bf16-rounded conv out)
    v_ref:    [cout, strip_rows*ws//3] f32 scratch (x-pooled strip)
    """
    n_strips = h_eff // strip_rows
    pooled_rows = strip_rows // 3
    ws3 = ws // 3
    m = strip_rows * ws

    for s in range(n_strips):
        for dy in range(3):
            for dx in range(3):
                # Guard offset; dx-1 tap shift.  Row pads are zero, so
                # the x edges need no masking (module docstring).
                start = _GUARD + (s * strip_rows + dy) * ws + dx - 1
                a_ref[(dy * 3 + dx) * cin:(dy * 3 + dx + 1) * cin, :] = (
                    x_ref[0, :, pl.ds(start, m)])

        lhs, rhs = w_ref[:], a_ref[:]
        if interpret:
            # XLA:CPU's DotThunk lacks bf16xbf16=f32; bf16 is exact in
            # f32, so upcasting is result-identical.
            lhs, rhs = lhs.astype(jnp.float32), rhs.astype(jnp.float32)
        acc = jax.lax.dot_general(
            lhs, rhs,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [cout, m]
        z = jnp.maximum(acc + bias_ref[:], 0.0)
        z = z.astype(jnp.bfloat16).astype(jnp.float32)

        # maxpool 3x3 stride 3 (see fused_conv1: strided lane phases +
        # row-block maxes; no vector reshapes).  Garbage windows that
        # touch the row pad are sliced away (valid windows end at
        # x = 3*(out_w-1)+2 <= w-1).
        z_ref[:, :] = z
        if interpret:
            # Interpret mode lacks strided loads; same math via reshape.
            v_ref[:, :] = jnp.max(z.reshape(cout, m // 3, 3), axis=2)
        else:
            v_ref[:, :] = jnp.maximum(
                jnp.maximum(z_ref[:, pl.Slice(0, m // 3, 3)],
                            z_ref[:, pl.Slice(1, m // 3, 3)]),
                z_ref[:, pl.Slice(2, m // 3, 3)])
        for t in range(pooled_rows):
            r0 = 3 * t * ws3
            row = jnp.maximum(
                jnp.maximum(v_ref[:, pl.ds(r0, ws3)],
                            v_ref[:, pl.ds(r0 + ws3, ws3)]),
                v_ref[:, pl.ds(r0 + 2 * ws3, ws3)])
            pooled = row[:, :out_w] * scale_ref[:] + offset_ref[:]
            orow = s * pooled_rows + t
            out_ref[0, :, pl.ds(orow * out_w, out_w)] = (
                pooled.astype(out_dtype))


def _strip_rows_for(h: int, cap: int = 24) -> int:
    """Largest strip height <= cap that tiles h into pool-aligned strips."""
    for n in range(-(-h // cap), h + 1):
        if h % n == 0 and (h // n) % 3 == 0:
            return h // n
    raise ValueError(f"height {h} not divisible into pool-aligned strips")


@functools.partial(jax.jit,
                   static_argnames=("out_dtype", "nhwc_out",
                                    "channel_major_in", "interpret"))
def fused_conv_block(x, kernel, bias, gamma, beta, mean, var,
                     *, out_dtype=jnp.bfloat16, nhwc_out: bool = True,
                     channel_major_in: bool = False,
                     interpret: bool = False):
    """One CNNLayer (conv+ReLU+maxpool3+BN), fused, for C_in >= 8.

    x:      [B, H, W, C_in] NHWC activations, or channel-major
            [B, C_in, H, W] with ``channel_major_in=True`` (explicit —
            shapes where W == C_in are ambiguous, so no autodetection);
            H need not divide 3 (floor pooling)
    kernel: [3, 3, C_in, C_out] HWIO float32; bias/gamma/beta/mean/var
            [C_out]
    returns [B, H//3, (W-3)//3 + 1, C_out] NHWC when ``nhwc_out``, else
            channel-major [B, C_out, H//3, (W-3)//3 + 1]

    Semantics parity: conv2d_same -> relu -> max_pool(3) ->
    batch_norm_infer at bfloat16_full numerics (ops/nn.py, layers.py;
    reference order frameID/net.py:33-40).
    """
    cin, cout = kernel.shape[2], kernel.shape[3]
    if channel_major_in:
        b, _, h, w = x.shape
        assert x.shape[1] == cin, (x.shape, cin)
        xcm = x
    else:
        b, h, w, _ = x.shape
        assert x.shape[3] == cin, (x.shape, cin)
        xcm = x.transpose(0, 3, 1, 2)
    h_eff = 3 * (h // 3)
    strip_rows = _strip_rows_for(h_eff)
    out_h, out_w = h // 3, (w - 3) // 3 + 1
    ws = 3 * (-(-(w + 1) // 3))

    # Channel-major padded flat layout with the leading zero guard (one
    # cheap XLA relayout per frame).
    xp = jnp.pad(xcm.astype(jnp.bfloat16),
                 ((0, 0), (0, 0), (1, 1), (0, ws - w)))
    xflat = jnp.pad(xp.reshape(b, cin, (h + 2) * ws),
                    ((0, 0), (0, 0), (_GUARD, _GUARD)))

    wt = kernel.reshape(9 * cin, cout).T.astype(jnp.bfloat16)
    scale = (gamma / jnp.sqrt(var + BN_EPS)).astype(jnp.float32)
    offset = (beta - mean * scale).astype(jnp.float32)

    kern = functools.partial(_kernel, h=h, h_eff=h_eff, w=w, ws=ws,
                             strip_rows=strip_rows, out_w=out_w,
                             cin=cin, cout=cout, out_dtype=out_dtype,
                             interpret=interpret)
    flat_in = _GUARD + (h + 2) * ws + _GUARD
    out = pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, cin, flat_in), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, cout, out_h * out_w),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, cout, out_h * out_w), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((9 * cin, strip_rows * ws), jnp.bfloat16),
            pltpu.VMEM((cout, strip_rows * ws), jnp.float32),
            pltpu.VMEM((cout, strip_rows * ws // 3), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * 9 * cin * cout,
            bytes_accessed=b * ((h + 2) * ws * cin * 2
                                + out_h * out_w * cout * 2),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xflat, wt, bias.astype(jnp.float32).reshape(cout, 1),
      scale.reshape(cout, 1), offset.reshape(cout, 1))
    out = out.reshape(b, cout, out_h, out_w)
    if nhwc_out:
        out = out.transpose(0, 2, 3, 1)
    return out
