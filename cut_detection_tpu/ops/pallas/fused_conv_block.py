"""Fused mid-stack Mosaic kernel: conv3x3 (C_in>=8) + ReLU + maxpool3 + BN.

Companion to ops/pallas/fused_conv1.py (layer 1, C_in=3).  Once layer 1
is fused, layers 2/3's conv activations become the pipeline's largest
remaining HBM round trip (layer 2 writes + re-reads a [48, 85, 48] bf16
tensor per frame around the pool).  This kernel keeps that tensor in
VMEM: NHWC bf16 activations stream in, pooled+BN'd activations stream
out.

Layout (one image per grid step, all in VMEM):

- Input is pre-padded flat NHWC ``[(H+2)*ws, C]`` — sublanes = flattened
  pixels (row stride ``ws = 3*ceil((W+1)/3)`` with >= 1 zero pad lane per
  row), lanes = channels.  Rows are padded with zeros so the conv's x
  padding comes for free: the left neighbor of x=0 is the previous row's
  trailing pad, the right neighbor of x=W-1 is this row's own pad (same
  trick as fused_conv1, but pixels live in sublanes here because C fills
  the lane dim).
- Every conv tap (dy, dx) of a row strip is ONE sublane-shifted slice
  ``[m, C]`` of the flat input; the strip's conv is 9 accumulated MXU
  contractions ``[m, C] @ [C, C_out]`` (bf16 x bf16, f32 accumulate) —
  no im2col materialization at all.
- ReLU in f32, cast bf16 (matching the shipped bf16_full XLA path),
  maxpool via sublane-only reshape-splits (``ws % 3 == 0`` aligns every
  row's x-windows with consecutive flat triples), then the eval-BN
  affine (scale = gamma/sqrt(var+eps), offset = beta - mean*scale).

Matches CNNLayer's exact op order — conv(pad 1) -> ReLU -> maxpool(3,3)
-> eval BatchNorm (frameID/net.py:33-40) — at bfloat16_full numerics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cut_detection_tpu.ops.nn import BN_EPS


def _kernel(x_ref, w_ref, bias_ref, scale_ref, offset_ref, out_ref,
            xg_ref, z_ref, v_ref, *, h: int, h_eff: int, w: int, ws: int,
            strip_rows: int, out_w: int, cin: int, cout: int, out_dtype,
            interpret: bool = False):
    """One image per grid step.

    x_ref:    [1, (h+2)*ws, cin] bf16 (H zero-padded 1 top/bottom, rows
              stored with stride ws, pad lanes zero)
    w_ref:    [9, cin, cout] bf16 (taps indexed dy*3+dx)
    bias/scale/offset: [1, cout] f32
    out_ref:  [1, h//3, out_w, cout] out_dtype
    xg_ref:   [(h+2)*ws + 2, cin] bf16 scratch (front/back guard sublanes
              so the dx-1 tap offset never underruns)
    z_ref:    [strip_rows*ws, cout] f32 scratch (bf16-rounded strip conv
              output; f32 because strided loads need 32-bit data)
    v_ref:    [strip_rows*ws//3, cout] f32 scratch (x-pooled strip)

    ``h_eff = 3*(h//3)`` <= h: floor-mode pooling (torch MaxPool2d,
    frameID/net.py:26) drops trailing conv rows, but conv row h_eff-1
    still reads input row h_eff — the strip loop covers h_eff output
    rows while the buffer keeps all h input rows.
    """
    n_strips = h_eff // strip_rows
    pooled_rows = strip_rows // 3
    ws3 = ws // 3
    flat = (h + 2) * ws
    m = strip_rows * ws

    @pl.when(pl.program_id(0) == 0)
    def _init():
        xg_ref[0:1, :] = jnp.zeros((1, cin), jnp.bfloat16)
        xg_ref[flat + 1:flat + 2, :] = jnp.zeros((1, cin), jnp.bfloat16)

    xg_ref[1:flat + 1, :] = x_ref[0]

    for s in range(n_strips):
        base = s * strip_rows * ws
        acc = jnp.zeros((m, cout), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                # +1 front guard; dx-1 tap offset (zero pads make the x
                # edges correct without masks — module docstring).
                start = base + dy * ws + dx
                tap = xg_ref[pl.ds(start, m), :]
                wk = w_ref[dy * 3 + dx]
                if interpret:
                    # XLA:CPU's DotThunk lacks bf16xbf16=f32; bf16 is
                    # exact in f32, so upcasting is result-identical.
                    tap, wk = tap.astype(jnp.float32), wk.astype(jnp.float32)
                acc = acc + jax.lax.dot_general(
                    tap, wk,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
        # bf16 activation rounding (the shipped XLA path pools bf16),
        # carried in f32: strided loads need 32-bit data, and bf16
        # values are exact in f32 so pooling is bit-identical.
        z = (jnp.maximum(acc + bias_ref[:], 0.0)
             .astype(jnp.bfloat16).astype(jnp.float32))

        # maxpool 3x3 stride 3.  ws % 3 == 0 aligns every row's
        # x-windows with consecutive flat triples; the x-reduction is an
        # elementwise max of the three stride-3 phases (tpu.strided_load
        # — vector reshapes splitting the sublane dim by 3 are
        # unsupported shape casts in Mosaic).  Garbage windows touching
        # the row pad are sliced away (valid windows end at
        # x = 3*(out_w-1)+2 <= w-1).
        z_ref[:, :] = z
        if interpret:
            # Interpret mode lacks strided loads; same math via reshape.
            v_ref[:, :] = jnp.max(z.reshape(m // 3, 3, cout), axis=1)
        else:
            v_ref[:, :] = jnp.maximum(
                jnp.maximum(z_ref[pl.Slice(0, m // 3, 3), :],
                            z_ref[pl.Slice(1, m // 3, 3), :]),
                z_ref[pl.Slice(2, m // 3, 3), :])
        # y-reduction: rows are ws3 sublanes apart in the x-pooled strip.
        for t in range(pooled_rows):
            r0 = 3 * t * ws3
            row = jnp.maximum(
                jnp.maximum(v_ref[pl.ds(r0, ws3), :],
                            v_ref[pl.ds(r0 + ws3, ws3), :]),
                v_ref[pl.ds(r0 + 2 * ws3, ws3), :])
            pooled = row[:out_w, :] * scale_ref[:] + offset_ref[:]
            out_ref[0, s * pooled_rows + t] = pooled.astype(out_dtype)


def _strip_rows_for(h: int) -> int:
    """Largest strip height <= 48 that tiles h into pool-aligned strips."""
    for n in range(-(-h // 48), h + 1):
        if h % n == 0 and (h // n) % 3 == 0:
            return h // n
    raise ValueError(f"height {h} not divisible into pool-aligned strips")


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def fused_conv_block(x, kernel, bias, gamma, beta, mean, var,
                     *, out_dtype=jnp.bfloat16, interpret: bool = False):
    """One CNNLayer (conv+ReLU+maxpool3+BN), fused, for C_in >= 8.

    x:      [B, H, W, C_in] activations (cast to bf16 inside; pass bf16
            to avoid a round trip); H need not divide 3 (floor pooling)
    kernel: [3, 3, C_in, C_out] HWIO float32; bias/gamma/beta/mean/var
            [C_out]
    returns [B, H//3, (W-3)//3 + 1, C_out] in ``out_dtype``

    Semantics parity: conv2d_same -> relu -> max_pool(3) ->
    batch_norm_infer at bfloat16_full numerics (ops/nn.py, layers.py;
    reference order frameID/net.py:33-40).
    """
    b, h, w, cin = x.shape
    cout = kernel.shape[3]
    h_eff = 3 * (h // 3)
    strip_rows = _strip_rows_for(h_eff)
    out_h, out_w = h // 3, (w - 3) // 3 + 1
    ws = 3 * (-(-(w + 1) // 3))

    xp = jnp.pad(x.astype(jnp.bfloat16),
                 ((0, 0), (1, 1), (0, ws - w), (0, 0)))
    xflat = xp.reshape(b, (h + 2) * ws, cin)

    wt = kernel.reshape(9, cin, cout).astype(jnp.bfloat16)
    scale = (gamma / jnp.sqrt(var + BN_EPS)).astype(jnp.float32)
    offset = (beta - mean * scale).astype(jnp.float32)

    kern = functools.partial(_kernel, h=h, h_eff=h_eff, w=w, ws=ws,
                             strip_rows=strip_rows, out_w=out_w,
                             cin=cin, cout=cout, out_dtype=out_dtype,
                             interpret=interpret)
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, (h + 2) * ws, cin), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, out_h, out_w, cout),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, out_h, out_w, cout), out_dtype),
        scratch_shapes=[
            pltpu.VMEM(((h + 2) * ws + 2, cin), jnp.bfloat16),
            pltpu.VMEM((strip_rows * ws, cout), jnp.float32),
            pltpu.VMEM((strip_rows * ws // 3, cout), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * 9 * cin * cout,
            bytes_accessed=b * ((h + 2) * ws * cin * 2
                                + out_h * out_w * cout * 2),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xflat, wt, bias.astype(jnp.float32).reshape(1, cout),
      scale.reshape(1, cout), offset.reshape(1, cout))
