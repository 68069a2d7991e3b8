"""Bilinear resize with bit-exact OpenCV INTER_LINEAR (uint8) parity.

The reference resizes every decoded frame on the host with
``cv2.resize(frame, (new_w, new_h), interpolation=cv2.INTER_LINEAR)``
(frameID/data.py:220-222), where ``new_w = 256`` and
``new_h = int(height * (new_w / width))`` (frameID/data.py:199-202).

For uint8 input OpenCV evaluates bilinear interpolation in fixed point and
(on any SIMD-capable host, i.e. always in practice) runs a vectorized
vertical pass whose rounding differs from the scalar formula.  The exact
recipe, verified bit-for-bit against cv2 5.0 across down/up-scales, odd
sizes, and borders (tests/test_resize.py):

- source coords: ``src = float32((dst + 0.5) * (in/out) - 0.5)``
- per-tap coefficients rounded half-to-even to int at scale 2^11
- horizontal taps are *pinned* at borders (coef -> (2048, 0) on the clamped
  tap); vertical taps *clamp the row index only*, keeping the fractional
  coefficients computed from the unclamped coordinate
- horizontal pass: int32 accumulate ``p_l*c_l + p_r*c_r``
- vertical pass (SIMD semantics): ``t >>= 4`` (to int16 range), 16-bit
  multiply-high ``(t * c) >> 16`` per tap, sum, then ``(sum + 2) >> 2``

Both paths are separable gathers with trace-time-constant indices and
coefficients (shapes are static under jit), so XLA lowers them to cheap
vectorized gathers + integer FMAs.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

_COEF_BITS = 11          # OpenCV INTER_RESIZE_COEF_BITS
_COEF_SCALE = 1 << _COEF_BITS


# Pure-math resize rule lives in the jax-free geometry module (the
# decode subprocess imports it without paying a jax import); re-exported
# here for the device-resize callers that historically found it here.
from cut_detection_tpu.geometry import reference_resize_dims  # noqa: F401


def _src_coords(in_size: int, out_size: int) -> np.ndarray:
    """float32 half-pixel-center source coordinates (cv2 uses float here)."""
    scale = in_size / out_size
    dst = np.arange(out_size, dtype=np.float64)
    return ((dst + 0.5) * scale - 0.5).astype(np.float32)


def _quantize(frac: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(left, right) int coefficients at scale 2^11, round half to even."""
    ql = np.rint((np.float32(1.0) - frac) * _COEF_SCALE).astype(np.int32)
    qr = np.rint(frac * _COEF_SCALE).astype(np.int32)
    return ql, qr


@functools.lru_cache(maxsize=None)
def _taps_horizontal(in_size: int, out_size: int):
    """Horizontal taps: borders pinned (cv2's HResize xmin/xmax handling)."""
    src = _src_coords(in_size, out_size)
    left = np.floor(src).astype(np.int64)
    frac = (src - left).astype(np.float32)
    under = left < 0
    left[under] = 0
    frac[under] = 0.0
    over = left >= in_size - 1
    left[over] = max(in_size - 2, 0)
    frac[over] = 1.0
    right = np.minimum(left + 1, in_size - 1)
    ql, qr = _quantize(frac)
    return (left.astype(np.int32), right.astype(np.int32),
            (1.0 - frac).astype(np.float32), frac.astype(np.float32), ql, qr)


@functools.lru_cache(maxsize=None)
def _taps_vertical(in_size: int, out_size: int):
    """Vertical taps: row indices clamped, coefficients NOT pinned.

    cv2's generic resize clamps the source-row pointers into range but keeps
    the coefficient pair computed from the unclamped coordinate — so border
    rows blend a row with itself using fractional weights.
    """
    src = _src_coords(in_size, out_size)
    sy = np.floor(src).astype(np.int64)
    frac = (src - sy).astype(np.float32)
    left = np.clip(sy, 0, in_size - 1)
    right = np.clip(sy + 1, 0, in_size - 1)
    ql, qr = _quantize(frac)
    return (left.astype(np.int32), right.astype(np.int32),
            (1.0 - frac).astype(np.float32), frac.astype(np.float32), ql, qr)


def _gather_axis(x, idx, axis):
    return jnp.take(x, jnp.asarray(idx), axis=axis)


def resize_bilinear(x, out_h: int, out_w: int, *, exact: bool | None = None):
    """Separable bilinear resize of NHWC (or HWC) images.

    ``exact=True`` (default for uint8 input) reproduces OpenCV's uint8
    SIMD INTER_LINEAR bit-for-bit and returns uint8.  ``exact=False``
    computes in float32 (same tap geometry, no quantization) and returns
    float32.
    """
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    in_h, in_w = x.shape[1], x.shape[2]
    if exact is None:
        exact = x.dtype == jnp.uint8

    yl, yr, cyl, cyr, qyl, qyr = _taps_vertical(in_h, out_h)
    xl, xr, cxl, cxr, qxl, qxr = _taps_horizontal(in_w, out_w)

    if exact:
        xi = x.astype(jnp.int32)
        # Horizontal pass: int32 accumulation at scale 2^11.
        h0 = _gather_axis(xi, xl, 2)
        h1 = _gather_axis(xi, xr, 2)
        cw0 = jnp.asarray(qxl).reshape(1, 1, out_w, 1)
        cw1 = jnp.asarray(qxr).reshape(1, 1, out_w, 1)
        tmp = h0 * cw0 + h1 * cw1          # <= 255 * 2048 = 522240
        # Vertical pass with cv2's SIMD rounding semantics.
        s0 = _gather_axis(tmp, yl, 1) >> 4  # <= 32640, int16 range
        s1 = _gather_axis(tmp, yr, 1) >> 4
        ch0 = jnp.asarray(qyl).reshape(1, out_h, 1, 1)
        ch1 = jnp.asarray(qyr).reshape(1, out_h, 1, 1)
        acc = ((s0 * ch0) >> 16) + ((s1 * ch1) >> 16)  # mulhi_epi16 pair
        out = (acc + 2) >> 2
        out = jnp.clip(out, 0, 255).astype(jnp.uint8)
    else:
        xf = x.astype(jnp.float32)
        h0 = _gather_axis(xf, xl, 2)
        h1 = _gather_axis(xf, xr, 2)
        cw0 = jnp.asarray(cxl).reshape(1, 1, out_w, 1)
        cw1 = jnp.asarray(cxr).reshape(1, 1, out_w, 1)
        tmp = h0 * cw0 + h1 * cw1
        v0 = _gather_axis(tmp, yl, 1)
        v1 = _gather_axis(tmp, yr, 1)
        ch0 = jnp.asarray(cyl).reshape(1, out_h, 1, 1)
        ch1 = jnp.asarray(cyr).reshape(1, out_h, 1, 1)
        out = v0 * ch0 + v1 * ch1

    return out[0] if squeeze else out


def resize_width_like_reference(x, resize: int, *, exact: bool | None = None):
    """Resize NHWC frames to width ``resize`` using the reference's size rule."""
    in_h, in_w = x.shape[-3], x.shape[-2]
    new_w, new_h = reference_resize_dims(in_w, in_h, resize)
    return resize_bilinear(x, new_h, new_w, exact=exact)
