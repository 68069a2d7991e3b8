"""Pixel-major fused conv block: conv3x3 + ReLU + maxpool3 + BN in VMEM.

Round-3 rework of ``fused_conv_block.py`` (channel-major, round 2) after
the relay's Mosaic toolchain dropped lane-strided loads entirely
(``tpu.strided_load`` now fails with "last dim size is not 128" for
EVERY lane-strided shape probed, including the round-2 kernels that
measured on hardware).  Sublane-strided slices still lower correctly, so
this kernel flips the layout: **pixels on sublanes, channels on lanes**
— which is NHWC's own order, so the wrapper needs no transposes at all:

- Input block ``[1, h*w, cin]`` is just NHWC flattened (zero-cost
  reshape for the caller).  The kernel copies each image row into a
  zero-bordered VMEM scratch ``[(h+2)*ws, cin]`` (ws = padded width,
  multiple of 3), so conv padding costs no HBM pass.
- im2col: tap ``t=(dy,dx)`` of EVERY output anchor is one contiguous
  sublane-offset slice ``xp[t_off : t_off+M]`` (``t_off = dy*ws + dx``)
  written to lane block ``A[:, t*cin:(t+1)*cin]`` — 9 vectorized copies,
  no per-pixel work (junk anchors in the right border recompute over
  zeros and are never selected by the pool compaction).
- One MXU contraction ``A [M, 9*cin] @ W [9*cin, cout]`` (bf16 operands,
  f32 accumulate) + lane-broadcast bias, ReLU, bf16 activation rounding
  carried in f32 (matching ``bfloat16_full`` numerics of ops/nn.py).
- maxpool 3x3/3: x-direction = elementwise max of three SUBLANE-offset
  slices (stride-1 shifts); y-direction = max of three slices offset by
  ``ws``; compaction = one sublane-STRIDED slice (stride 3) per pooled
  row — the op the current Mosaic still supports.
- Eval-BN affine is applied on the compacted ``[out_w, cout]`` tile as a
  lane-broadcast multiply-add; output ``[1, out_h*out_w, cout]`` is NHWC
  flat, so chained blocks compose with zero relayout.

Semantics parity: conv(pad 1) -> ReLU -> maxpool(3,3) -> eval BatchNorm
(frameID/net.py:33-40) at bfloat16_full numerics; floor-mode pooling
(h % 3 != 0 supported naturally — no strip divisibility constraints).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cut_detection_tpu.ops.nn import BN_EPS


def _kernel(x_ref, w_ref, bias_ref, scale_ref, offset_ref, out_ref,
            xp_ref, a_ref, z_ref, m_ref, *, h: int, w: int, ws: int,
            cin: int, cout: int, out_h: int, out_w: int, out_dtype,
            interpret: bool = False):
    """One image per grid step.

    x_ref:   [1, h*w, cin] bf16 (NHWC flat)
    w_ref:   [9*cin, cout] bf16 (row order (dy*3+dx)*cin + ci = HWIO flat)
    bias/scale/offset: [1, cout] f32 (lane vectors)
    out_ref: [1, out_h*out_w, cout] out_dtype (NHWC flat)
    xp_ref:  [(h+2)*ws + 8, cin] bf16 scratch (zero-bordered padded
             image; 8 guard rows so tap offset 2*ws+2 never overruns)
    a_ref:   [M, 9*cin] bf16 scratch, M = h*ws (im2col)
    z_ref:   [M, cout] f32 scratch (conv out; reused for y-pool output)
    m_ref:   [M, cout] f32 scratch (x-pool output)
    """
    M = h * ws

    # Zero the padded scratch every step (a VMEM-bandwidth write, cheap
    # next to the matmul): a first-step-only zeroing would break if the
    # grid were ever split across megacore TensorCores, and only the
    # border lanes actually need it.
    xp_ref[:, :] = jnp.zeros_like(xp_ref)

    # Pad-copy: image row y -> padded row y+1, columns [1, w+1).
    for y in range(h):
        xp_ref[pl.ds((y + 1) * ws + 1, w), :] = x_ref[0, pl.ds(y * w, w), :]

    # im2col: 9 sublane-offset block copies.
    for dy in range(3):
        for dx in range(3):
            t = dy * 3 + dx
            a_ref[:, t * cin:(t + 1) * cin] = xp_ref[pl.ds(dy * ws + dx, M), :]

    lhs, rhs = a_ref[:, :], w_ref[:, :]
    if interpret:
        # XLA:CPU's DotThunk lacks bf16xbf16=f32; bf16 is exact in f32.
        lhs, rhs = lhs.astype(jnp.float32), rhs.astype(jnp.float32)
    acc = jax.lax.dot_general(
        lhs, rhs, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # [M, cout]
    z = jnp.maximum(acc + bias_ref[0, :], 0.0)
    z_ref[:, :] = z.astype(jnp.bfloat16).astype(jnp.float32)

    # maxpool 3x3 stride 3.  x-direction: max of sublane shifts 0/1/2
    # (valid anchors x <= w-3 never touch the zero pad); y-direction:
    # shifts of ws; compaction picks anchors (3ty*ws + 3tx) per pooled
    # row with ONE stride-3 sublane slice.
    Lx = M - 2
    m_ref[pl.ds(0, Lx), :] = jnp.maximum(
        jnp.maximum(z_ref[pl.ds(0, Lx), :], z_ref[pl.ds(1, Lx), :]),
        z_ref[pl.ds(2, Lx), :])
    Ly = Lx - 2 * ws
    z_ref[pl.ds(0, Ly), :] = jnp.maximum(
        jnp.maximum(m_ref[pl.ds(0, Ly), :], m_ref[pl.ds(ws, Ly), :]),
        m_ref[pl.ds(2 * ws, Ly), :])
    for ty in range(out_h):
        pooled = z_ref[pl.Slice(3 * ty * ws, out_w, 3), :]
        y = pooled * scale_ref[0, :] + offset_ref[0, :]
        out_ref[0, pl.ds(ty * out_w, out_w), :] = y.astype(out_dtype)


@functools.partial(jax.jit,
                   static_argnames=("out_dtype", "interpret"))
def fused_conv_block_pm(x, kernel, bias, gamma, beta, mean, var,
                        *, out_dtype=jnp.bfloat16, interpret: bool = False):
    """One CNNLayer (conv+ReLU+maxpool3+BN), fused, pixel-major.

    x:      [B, H, W, C_in] NHWC activations (H % 3 need not be 0)
    kernel: [3, 3, C_in, C_out] HWIO float32; bias/gamma/beta/mean/var
            [C_out]
    returns [B, H//3, (W-3)//3 + 1, C_out] NHWC

    Semantics parity: conv2d_same -> relu -> max_pool(3) ->
    batch_norm_infer at bfloat16_full numerics (ops/nn.py, layers.py;
    reference order frameID/net.py:33-40).
    """
    b, h, w, cin = x.shape
    cout = kernel.shape[3]
    assert kernel.shape[:3] == (3, 3, cin), kernel.shape
    out_h, out_w = h // 3, (w - 3) // 3 + 1
    # Padded width: >= w+2 for the zero borders, multiple of 3 so pooled
    # anchors stay aligned (and of 8 for clean sublane tiling).
    ws = -(-(w + 2) // 24) * 24
    M = h * ws

    xflat = x.astype(jnp.bfloat16).reshape(b, h * w, cin)
    wt = kernel.reshape(9 * cin, cout).astype(jnp.bfloat16)
    scale = (gamma / jnp.sqrt(var + BN_EPS)).astype(jnp.float32)
    offset = (beta - mean * scale).astype(jnp.float32)

    kern = functools.partial(_kernel, h=h, w=w, ws=ws, cin=cin, cout=cout,
                             out_h=out_h, out_w=out_w, out_dtype=out_dtype,
                             interpret=interpret)
    out = pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h * w, cin), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, out_h * out_w, cout),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, out_h * out_w, cout), out_dtype),
        scratch_shapes=[
            pltpu.VMEM(((h + 2) * ws + 8, cin), jnp.bfloat16),
            pltpu.VMEM((M, 9 * cin), jnp.bfloat16),
            pltpu.VMEM((M, cout), jnp.float32),
            pltpu.VMEM((M, cout), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * M * 9 * cin * cout,
            bytes_accessed=b * (h * w * cin * 2
                                + out_h * out_w * cout * 2),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xflat, wt, bias.astype(jnp.float32).reshape(1, cout),
      scale.reshape(1, cout), offset.reshape(1, cout))
    return out.reshape(b, out_h, out_w, cout)
