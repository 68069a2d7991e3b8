"""Fused layer-1 Mosaic kernel: conv3x3 + ReLU + maxpool3 + BN, one pass.

The bf16_full pipeline is ~70% HBM-bound on layer 1's activation round
trip: XLA materializes the [144, 256, 48] conv output (3.5 MB bf16 per
frame, written + re-read around the pool) because reduce_window does not
fuse into a convolution.  This kernel keeps that tensor in VMEM: uint8
pixels stream in, pooled+BN'd bf16 activations stream out, cutting
layer-1 HBM traffic from ~7 MB to ~0.5 MB per frame.

Matches CNNLayer's exact op order — conv(pad 1) -> ReLU -> maxpool(3,3)
-> eval BatchNorm (frameID/net.py:33-40) — for the bfloat16_full
numerics (bf16 operands, f32 accumulation, bf16 pooled activations).

Design (batch-amortized tap assembly per docs/ROADMAP.md #3, third
layout iteration — see docs/PERFORMANCE.md for the two that lost):

- Input is pre-padded planar uint8 ``[B, 3, (H+2)*ws]`` — each channel
  one flat lane vector with row stride ``ws = 3*ceil((w+1)/3)`` whose
  zero pad lanes double as the conv's x padding, so every conv tap
  (dy, dx, c) of a row strip is ONE shifted lane-slice: 27 vectorized
  copies assemble the strip's im2col matrix ``A [32, rows*ws]`` with no
  per-pixel work and no lane<->sublane relayout.
- One matmul per strip in the MXU's NATIVE orientation:
  ``W [48, 32] @ A [32, m]`` -> ``[48, m]`` (bf16 x bf16, f32
  accumulate) — channels in sublanes, pixels in lanes.  (The previous
  iteration produced ``[m, 48]``, which made Mosaic transpose operands
  and pad the 48-lane scratches to 128 lanes; it measured 2x slower
  than XLA.)
- ReLU + bf16 activation rounding carried in f32 (strided loads only
  support 32-bit data; bf16 values are exact in f32, so pooling the
  rounded values is bit-identical to pooling bf16).
- maxpool 3x3/3 with no vector reshapes (Mosaic rejects shape casts
  that split a tiled dim by 3): the x-reduction is an elementwise max
  of the three stride-3 LANE phases via ``tpu.strided_load``; the
  y-reduction a max of three contiguous row-block lane slices per
  pooled row, then the BN affine (scale = gamma/sqrt(var+eps),
  offset = beta - mean*scale).
- Output stays channel-major ``[B, 48, out_h*out_w]`` (the natural
  layout of the result); the wrapper exposes NHWC via one XLA
  transpose, or downstream fused blocks can consume channel-major
  directly.
- Grid = (B,): Pallas double-buffers the uint8 input blocks and output
  blocks across images (streaming HBM<->VMEM overlapped with compute).

Weight padding note: A's tap rows 27..31 are zeroed once (first grid
step; scratch persists) because W's padded columns are zero and
0 * garbage could be NaN.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cut_detection_tpu.ops.nn import BN_EPS

_K_PAD = 32  # 27 taps padded to the sublane tile


def _kernel(x_ref, w_ref, bias_ref, scale_ref, offset_ref, out_ref,
            xbf_ref, a_ref, z_ref, v_ref, *, h: int, w: int, ws: int,
            strip_rows: int, out_w: int, out_dtype,
            interpret: bool = False):
    """One image per grid step.

    x_ref:    [1, 3, (h+2)*ws] uint8 (H zero-padded by 1 top/bottom; each
              row stored with stride ws = 3*ceil((w+1)/3), the extra
              lanes zero.  The in-row zero pad doubles as the conv's x
              padding: the left neighbor of x=0 is the previous row's
              trailing pad, the right neighbor of x=w-1 this row's own)
    w_ref:    [48, 32] bf16 (HWIO-flattened taps, k = (dy*3+dx)*3 + c)
    bias/scale/offset: [48, 1] f32
    out_ref:  [1, 48, (h//3)*out_w] out_dtype (channel-major rows)
    xbf_ref:  [3, (h+2)*ws + 2] bf16 scratch (front/back guard lanes)
    a_ref:    [32, strip_rows*ws] bf16 scratch (the strip im2col matrix)
    z_ref:    [48, strip_rows*ws] f32 scratch (bf16-rounded strip conv
              output; f32 because strided loads need 32-bit data)
    v_ref:    [48, strip_rows*ws//3] f32 scratch (x-pooled strip)
    """
    n_strips = h // strip_rows
    pooled_rows = strip_rows // 3
    ws3 = ws // 3
    flat = (h + 2) * ws
    m = strip_rows * ws

    @pl.when(pl.program_id(0) == 0)
    def _init():
        # Zero the padded tap rows once (see module docstring) and the
        # one-lane front/back guards of the channel planes.
        a_ref[27:32, :] = jnp.zeros((5, m), jnp.bfloat16)
        xbf_ref[:, 0:1] = jnp.zeros((3, 1), jnp.bfloat16)
        xbf_ref[:, flat + 1:flat + 2] = jnp.zeros((3, 1), jnp.bfloat16)

    # uint8 -> bf16 once per image (all values 0..255 are exact in bf16).
    # Mosaic can't cast unsigned -> float; hop u8 -> i32 -> f32 -> bf16.
    xbf_ref[:, 1:flat + 1] = (x_ref[0].astype(jnp.int32)
                              .astype(jnp.float32).astype(jnp.bfloat16))

    for s in range(n_strips):
        base = s * strip_rows * ws  # strip's first flat lane (padded coords)
        for dy in range(3):
            for dx in range(3):
                for c in range(3):
                    k = (dy * 3 + dx) * 3 + c
                    # +1 for the front guard; dx-1 tap offset.  Row pads
                    # are zero, so x edges need no masking (docstring).
                    start = base + dy * ws + dx
                    a_ref[k, :] = xbf_ref[c, pl.ds(start, m)]

        # All channels x all pixels of the strip in one MXU contraction,
        # native orientation: lhs [48, K], rhs [K, m].  (Interpret mode
        # upcasts: XLA:CPU's DotThunk lacks bf16xbf16=f32, and bf16
        # values are exact in f32, so results are identical.)
        lhs, rhs = w_ref[:], a_ref[:]
        if interpret:
            lhs, rhs = lhs.astype(jnp.float32), rhs.astype(jnp.float32)
        acc = jax.lax.dot_general(
            lhs, rhs,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [48, m]
        z = jnp.maximum(acc + bias_ref[:], 0.0)
        z = z.astype(jnp.bfloat16).astype(jnp.float32)

        # maxpool 3x3 stride 3.  ws % 3 == 0 makes the x-windows of
        # every row line up with consecutive lane triples; x-reduce as
        # max of the three stride-3 lane phases.  Window u = ws3-1 (and
        # any window touching the row pad, x >= w-2) is garbage and
        # sliced away — valid windows end at x = 3*(out_w-1)+2 <= w-1.
        z_ref[:, :] = z
        if interpret:
            # Interpret mode lacks strided loads; same math via reshape.
            v_ref[:, :] = jnp.max(z.reshape(48, m // 3, 3), axis=2)
        else:
            v_ref[:, :] = jnp.maximum(
                jnp.maximum(z_ref[:, pl.Slice(0, m // 3, 3)],
                            z_ref[:, pl.Slice(1, m // 3, 3)]),
                z_ref[:, pl.Slice(2, m // 3, 3)])
        # y-reduction: rows are ws3 lanes apart in the x-pooled strip;
        # per pooled row, max three contiguous row blocks, slice off the
        # pad windows, apply the BN affine, write channel-major.
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
    """Largest strip height <= cap that tiles h into pool-aligned strips.

    The cap bounds the f32 pooling scratches and vector stack temps;
    24 rows keeps the kernel well inside the 16 MB scoped-vmem limit at
    the prod 144x256 shape (channel-major scratches have no lane
    padding, so the budget is much looser than the [m, 48] layout's).
    """
    for n in range(-(-h // cap), h + 1):
        if h % n == 0 and (h // n) % 3 == 0:
            return h // n
    raise ValueError(f"height {h} not divisible into pool-aligned strips")


@functools.partial(jax.jit,
                   static_argnames=("out_dtype", "nhwc_out", "interpret"))
def fused_conv1_pool(x_u8, kernel, bias, gamma, beta, mean, var,
                     *, out_dtype=jnp.bfloat16, nhwc_out: bool = True,
                     interpret: bool = False):
    """Layer 1 of the prod stack, fused: uint8 NHWC frames -> pooled out.

    x_u8:   [B, H, W, 3] uint8 (raw BGR; pass the *folded* layer-1 kernel
            from assembly.fold_preprocess so the BGR flip + /255 are
            already absorbed into the weights)
    kernel: [3, 3, 3, 48] HWIO float32, bias/gamma/beta/mean/var: [48]
    returns [B, H//3, (W-3)//3 + 1, 48] NHWC when ``nhwc_out`` (one XLA
            transpose), else channel-major [B, 48, H//3, (W-3)//3 + 1]

    Semantics parity: conv2d_same -> relu -> max_pool(3) ->
    batch_norm_infer at bfloat16_full numerics (ops/nn.py, layers.py).
    """
    b, h, w, cin = x_u8.shape
    assert cin == 3 and h % 3 == 0, (h, w, cin)
    strip_rows = _strip_rows_for(h)
    out_h, out_w = h // 3, (w - 3) // 3 + 1
    # Row stride: multiple of 3 (pool windows align with lane triples)
    # with >= 1 zero pad lane (doubles as the conv's x zero padding).
    ws = 3 * (-(-(w + 1) // 3))

    # Planar + padded + flattened view of the frames (one cheap XLA
    # relayout; ~0.2 MB/frame of HBM traffic vs the ~7 MB the fusion
    # saves).
    xp = jnp.pad(x_u8, ((0, 0), (1, 1), (0, ws - w), (0, 0)))
    xflat = xp.transpose(0, 3, 1, 2).reshape(b, 3, (h + 2) * ws)

    w2 = kernel.reshape(9 * cin, 48)  # k = (dy*3 + dx)*3 + c (HWIO order)
    w2 = jnp.pad(w2, ((0, _K_PAD - 9 * cin), (0, 0)))
    w2t = w2.T.astype(jnp.bfloat16)  # [48, 32]

    scale = (gamma / jnp.sqrt(var + BN_EPS)).astype(jnp.float32)
    offset = (beta - mean * scale).astype(jnp.float32)

    kern = functools.partial(_kernel, h=h, w=w, ws=ws,
                             strip_rows=strip_rows, out_w=out_w,
                             out_dtype=out_dtype, interpret=interpret)
    out = pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 3, (h + 2) * ws), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 48, out_h * out_w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 48, out_h * out_w), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((3, (h + 2) * ws + 2), jnp.bfloat16),
            pltpu.VMEM((_K_PAD, strip_rows * ws), jnp.bfloat16),
            pltpu.VMEM((48, strip_rows * ws), jnp.float32),
            pltpu.VMEM((48, strip_rows * ws // 3), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * 27 * 48,
            bytes_accessed=b * (3 * h * w + out_h * out_w * 48 * 2),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xflat, w2t, bias.astype(jnp.float32).reshape(48, 1),
      scale.reshape(48, 1), offset.reshape(48, 1))
    out = out.reshape(b, 48, out_h, out_w)
    if nhwc_out:
        out = out.transpose(0, 2, 3, 1)
    return out
