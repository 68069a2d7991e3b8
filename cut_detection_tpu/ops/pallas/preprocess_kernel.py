"""Fused frame-preprocess Pallas kernel: resize + BGR->RGB + /255.

The production preprocess (ops/preprocess.py) is three logical stages —
bilinear resize, channel flip, normalize — which XLA runs as gathers +
elementwise ops with an intermediate trip through HBM.  This kernel fuses
the whole thing into one VMEM-resident pass per frame:

- The separable bilinear resize is recast as two small **matmuls** with
  banded interpolation matrices ``R_h [out_h, in_h]`` and ``R_w [in_w,
  out_w]`` (each row/column holds the 2 bilinear taps).  On TPU this puts
  the resize on the MXU instead of the gather units, and the /255 scale is
  folded into ``R_h``.
- The BGR->RGB flip is free: the channel grid axis indexes the *source*
  channel through the BlockSpec index map.

Numerics: float32 matmul bilinear — matches the float resize path
(ops/resize.py ``exact=False``), NOT the uint8 fixed-point path; use the
XLA ``exact=True`` resize when bit-parity with cv2 is required.  Taps and
sizes are trace-time constants, so the kernel is fully static.

Layout note: frames arrive HWC-interleaved from the decoder; the kernel
consumes planar [B, C, H, W] (cheap transpose on device) so each grid cell
streams one [H, W] plane through VMEM:

    grid = (B, C):  out[b, :, :, 2-c] = (R_h @ plane(b, c)) @ R_w
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cut_detection_tpu.ops.resize import _taps_horizontal, _taps_vertical


@functools.lru_cache(maxsize=None)
def _resize_matrices(in_h: int, in_w: int, out_h: int, out_w: int):
    """(R_h [out_h, in_h] with /255 folded in, R_w [in_w, out_w])."""
    yl, yr, cyl, cyr, _, _ = _taps_vertical(in_h, out_h)
    xl, xr, cxl, cxr, _, _ = _taps_horizontal(in_w, out_w)
    rh = np.zeros((out_h, in_h), dtype=np.float32)
    idx = np.arange(out_h)
    # += accumulates the clamped-border case where both taps hit one row.
    np.add.at(rh, (idx, yl), cyl)
    np.add.at(rh, (idx, yr), cyr)
    rh /= 255.0
    rw = np.zeros((in_w, out_w), dtype=np.float32)
    idx = np.arange(out_w)
    np.add.at(rw, (xl, idx), cxl)
    np.add.at(rw, (xr, idx), cxr)
    return rh, rw


def _kernel(frame_ref, rh_ref, rw_ref, out_ref):
    # frame_ref: [1, 1, H, W] uint8 plane block; rh: [out_h, H]; rw: [W, out_w].
    # Mosaic has no direct uint8->f32 cast; widen through int32 first.
    plane = frame_ref[0, 0, :, :].astype(jnp.int32).astype(jnp.float32)
    # HIGHEST: MXU DEFAULT would truncate the f32 pixels to bf16 operands
    # (~0.004 absolute error on [0,1] pixels).
    hi = jax.lax.Precision.HIGHEST
    rows = jnp.dot(rh_ref[:], plane, preferred_element_type=jnp.float32,
                   precision=hi)
    out_ref[0, 0, :, :] = jnp.dot(rows, rw_ref[:],
                                  preferred_element_type=jnp.float32,
                                  precision=hi)


def fused_resize_normalize(frames_u8_bgr, out_h: int, out_w: int,
                           *, input_hwc: bool = True):
    """[B, H, W, 3] uint8 BGR -> [B, out_h, out_w, 3] float32 RGB in [0,1].

    One Pallas kernel invocation per (frame, channel): MXU resize with the
    normalize folded into the row matrix and the BGR->RGB flip folded into
    the output index map.
    """
    if input_hwc:
        planar = jnp.transpose(frames_u8_bgr, (0, 3, 1, 2))
    else:
        planar = frames_u8_bgr
    b, c, in_h, in_w = planar.shape
    assert c == 3, "expected 3-channel frames"
    rh, rw = _resize_matrices(in_h, in_w, out_h, out_w)

    out_planar = pl.pallas_call(
        _kernel,
        grid=(b, c),
        in_specs=[
            pl.BlockSpec((1, 1, in_h, in_w), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((out_h, in_h), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((in_w, out_w), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        # BGR -> RGB: grid channel j writes output channel 2 - j.
        out_specs=pl.BlockSpec((1, 1, out_h, out_w),
                               lambda i, j: (i, 2 - j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, out_h, out_w), jnp.float32),
    )(planar, jnp.asarray(rh), jnp.asarray(rw))
    return jnp.transpose(out_planar, (0, 2, 3, 1))
