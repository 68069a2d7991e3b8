"""Fused conv1+ReLU+maxpool Pallas kernel (VMEM-resident layer 1).

Motivation (docs/PERFORMANCE.md): at the shipped bf16_full rate the
remaining per-frame cost is dominated by materializing conv1's output
([144, 256, 48]) to HBM and reading it back for the max-pool.  This
kernel keeps layer 1 in VMEM: the input plane loads once per image, conv
rows are computed via an im2col matmul, pooled immediately, and only the
pooled [48, 85, 48] output is written back.

Layout notes (all learned the hard way — see git history):

- Input rides **planar** [B, Cin, H+2, W+2] so W sits on the 128-lane
  dimension; an NHWC block would pad the 3-channel minor dim to 128 lanes
  (a 42x VMEM blowup that OOMs scoped vmem).
- The im2col buffer is [9*Cin, W] (taps on sublanes): each tap row is a
  lane-vector slice of an input row, lane-normalized with ``pltpu.roll``
  (Mosaic cannot concatenate/store vectors whose source lane offsets
  differ).
- The matmul contracts the tap dimension of [27, W] directly against
  ``w27 [27, Cout]`` via ``dot_general`` — no transposes materialize.

Weight layout: ``w27 [27, Cout]`` with row index ``(dy*3 + dx)*Cin + c``.
The preprocess fold (flip + /255, models/assembly.fold_preprocess)
composes with this: pass the folded kernel and raw uint8 BGR pixels.

**Status: measured and rejected (negative result #3).**  Compiles and is
numerically correct on the v5e, but measured **14.2k fps** in the full
model vs 80.7k for XLA's conv — the im2col tap assembly (27 roll+store
ops per conv row, ~3.9k per image, serialized under the row loop)
dominates, dwarfing the HBM round trip it saves.  XLA's native conv
emitter pipelines layer 1 better than this hand fusion; kept in-tree with
interpret-mode parity tests as a recorded experiment
(docs/PERFORMANCE.md).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cut_detection_tpu.ops.nn import BN_EPS


def pack_w27(kernel) -> jax.Array:
    """[3, 3, Cin, Cout] -> [9 * Cin, Cout] with row (dy*3+dx)*Cin + c."""
    k = jnp.asarray(kernel)
    return k.reshape(9 * k.shape[2], k.shape[3])


def _make_kernel(hp: int, wp: int, cin: int, cout: int, w_pad: int):
    w_valid = w_pad - 2  # original W
    w_pad_len = w_pad

    def kernel(x_ref, w_ref, bias_ref, bn_s_ref, bn_t_ref, out_ref,
               patch_ref):
        # x_ref: [1, Cin, H+2, W+2]; patch_ref: [9*Cin, W] scratch;
        # out_ref: [1, H//3, W//3, Cout].
        w27 = w_ref[:]
        bias = bias_ref[0, :]
        bn_s = bn_s_ref[0, :]
        bn_t = bn_t_ref[0, :]

        def pool_row(r, _):
            def conv_row(cr):
                for dy in range(3):
                    for c in range(cin):
                        row = x_ref[0, c, 3 * r + cr + dy, :].reshape(1, -1)
                        for dx in range(3):
                            idx = (dy * 3 + dx) * cin + c
                            # roll() wants non-negative shifts: left-by-dx
                            # == right-by-(len - dx).
                            shifted = row if dx == 0 else pltpu.roll(
                                row, w_pad_len - dx, 1)
                            patch_ref[idx:idx + 1, :] = \
                                shifted[:, :w_valid]
                # [27, W] x [27, Cout] -> [W, Cout]
                acc = jax.lax.dot_general(
                    patch_ref[:], w27,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                return jnp.maximum(acc + bias, 0.0)

            rows = jnp.stack([conv_row(0), conv_row(1), conv_row(2)])
            m = jnp.max(rows, axis=0)[: 3 * wp]
            m = jnp.max(m.reshape(wp, 3, cout), axis=1)
            out_ref[0, r, :, :] = m * bn_s + bn_t
            return 0

        jax.lax.fori_loop(0, hp, pool_row, 0)

    return kernel


def conv1_pool_fused(x_u8, kernel, bias, bn_mean, bn_var, bn_gamma, bn_beta):
    """Fused layer 1: uint8 [B, H, W, Cin] -> f32 [B, H//3, W//3, Cout].

    Semantics: conv3x3(zero pad 'same') -> +bias -> ReLU -> maxpool3
    (floor) -> eval BN, i.e. frameID/net.py:33-40's block.  Pass the
    preprocess-folded kernel (assembly.fold_preprocess) so raw BGR pixels
    are the input.
    """
    b, h, w, cin = x_u8.shape
    cout = kernel.shape[3]
    hp, wp = h // 3, w // 3

    # Zero 'same' padding, planar f32 (W on the lane dimension — see the
    # module docstring).
    xf = jnp.pad(x_u8.astype(jnp.float32), ((0, 0), (1, 1), (1, 1), (0, 0)))
    xp = jnp.transpose(xf, (0, 3, 1, 2))

    w27 = pack_w27(kernel).astype(jnp.float32)
    bn_s = (jnp.asarray(bn_gamma) *
            jax.lax.rsqrt(jnp.asarray(bn_var) + BN_EPS)).astype(jnp.float32)
    bn_t = (jnp.asarray(bn_beta) -
            jnp.asarray(bn_mean) * bn_s).astype(jnp.float32)

    return pl.pallas_call(
        _make_kernel(hp, wp, cin, cout, w + 2),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, cin, h + 2, w + 2), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * cin, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hp, wp, cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hp, wp, cout), jnp.float32),
        scratch_shapes=[pltpu.VMEM((9 * cin, w), jnp.float32)],
    )(xp, w27, jnp.asarray(bias, jnp.float32).reshape(1, cout),
      bn_s.reshape(1, cout), bn_t.reshape(1, cout))
