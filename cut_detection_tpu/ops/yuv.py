"""On-device planar YUV420 -> BGR24, bit-exact with swscale.

Why: the pipeline's host->device transfer is its top measured cost on
relay-attached hosts, and the tunnel burns host CPU proportional to
bytes (scripts/probe_e2e_phase4.py: ~92% of a core in system time).
The codec's native 4:2:0 representation is 1.5 B/px vs BGR24's 3 B/px —
uploading planar YUV420 and converting on device halves the transfer.
The reference's conversion happens inside cv2's VideoCapture.read
(/root/reference/frameID/data.py:213), which is ffmpeg's swscale; our
native decoder (native/video_decoder.cpp) uses swscale directly and is
byte-identical to cv2 (pinned in tests) — so the on-device conversion
emulates *swscale's* same-size yuv420p->bgr24 converter, exactly.

Derivation (scripts/derive_yuv_constants.py, against the live swscale in
native/libcutdet_decoder.so `vd_yuv420_to_bgr24`):

- Chroma upsampling is NEAREST within each 2x2 block (probed: a chroma
  sample colors exactly its 4 luma pixels).
- Each channel is additive in OUTPUT units pre-clip:
      B = clip8(ly[Y] + bu[U])
      G = clip8(ly[Y] + gu[U] + gv[V])
      R = clip8(ly[Y] + rv[V])
  verified EXHAUSTIVELY: all 2^24 (Y,U,V) combinations in one 4096x4096
  probe image, 0 mismatches (tests/test_yuv.py re-runs it).
- The integer tables reduce to closed forms (arithmetic right shift =
  floor division, matching numpy/jax int semantics):
      ly[y] = (76309 * (y - 16) + 512) >> 16      # 76309 = (255<<16)//219
      bu[u] = (132201 * (u - 128)) >> 16          # BT.601 2.018 in 16.16
      gu[u] = (-25671 * (u - 128)) >> 16          # -0.392
      gv[v] = (-53279 * (v - 128)) >> 16          # -0.813
      rv[v] = (104597 * (v - 128)) >> 16          # 1.596
  Each (coef, round) pair is pinned by the table-equality test against
  live swscale for all 256 entries (the feasible rounding band was
  picked once; any drift in a future ffmpeg fails the test loudly).

TPU mapping: 5 int32 multiply-add-shift chains + clip, fully
vectorizable on the VPU (no gathers — a LUT would cost ~40 ns/lookup);
XLA fuses the conversion into the classify step's preprocess.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Fixed-point constants (16.16), derived + pinned as documented above.
LY_COEF, LY_ROUND = 76309, 512
BU_COEF = 132201
GU_COEF = -25671
GV_COEF = -53279
RV_COEF = 104597


# Pure-math layout helper lives in the jax-free geometry module (the
# decode subprocess imports it without paying a jax import); re-exported
# here because this module defines the layout's device consumer.
from cut_detection_tpu.geometry import yuv420_nbytes  # noqa: F401


def pack_yuv420(y: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Concatenate tight planes into the flat layout the device op takes."""
    return np.concatenate([np.ascontiguousarray(y).reshape(-1),
                           np.ascontiguousarray(u).reshape(-1),
                           np.ascontiguousarray(v).reshape(-1)])


def _tables_np():
    """The five 256-entry integer tables (for tests / host reference)."""
    i = np.arange(256, dtype=np.int64)
    return {
        "ly": (LY_COEF * (i - 16) + LY_ROUND) >> 16,
        "bu": (BU_COEF * (i - 128)) >> 16,
        "gu": (GU_COEF * (i - 128)) >> 16,
        "gv": (GV_COEF * (i - 128)) >> 16,
        "rv": (RV_COEF * (i - 128)) >> 16,
    }


def yuv420_to_bgr(yuv_flat, h: int, w: int):
    """[B, yuv420_nbytes(h,w)] uint8 planar YUV420 -> [B, h, w, 3] uint8 BGR.

    Bit-exact emulation of swscale's same-size yuv420p->bgr24 converter
    (see module docstring); jit-friendly static shapes, int32 arithmetic.

    EVEN dims only: for odd h/w swscale rejects its unscaled special
    converter and routes through the generic scaler, whose interpolating
    chroma upsample is a different algorithm entirely (probed: no
    nearest mapping reproduces it).  The pipeline falls back to the BGR
    transfer for odd target geometries instead of shipping a
    near-miss emulation.
    """
    if h % 2 or w % 2:
        raise ValueError(
            f"yuv420_to_bgr supports even dims only, got {h}x{w} "
            "(odd sizes take swscale's interpolating generic path; "
            "use the BGR transfer there)")
    cw, ch = (w + 1) // 2, (h + 1) // 2
    ysz, csz = h * w, cw * ch
    y = yuv_flat[:, :ysz].reshape(-1, h, w).astype(jnp.int32)
    u = yuv_flat[:, ysz:ysz + csz].reshape(-1, ch, cw).astype(jnp.int32)
    v = yuv_flat[:, ysz + csz:].reshape(-1, ch, cw).astype(jnp.int32)
    # Nearest 2x2 chroma upsample (swscale's unscaled-converter rule),
    # cropped for odd dims (chroma covers ceil halves).
    u = jnp.repeat(jnp.repeat(u, 2, axis=1), 2, axis=2)[:, :h, :w]
    v = jnp.repeat(jnp.repeat(v, 2, axis=1), 2, axis=2)[:, :h, :w]
    ly = (LY_COEF * (y - 16) + LY_ROUND) >> 16
    bu = (BU_COEF * (u - 128)) >> 16
    gu = (GU_COEF * (u - 128)) >> 16
    gv = (GV_COEF * (v - 128)) >> 16
    rv = (RV_COEF * (v - 128)) >> 16
    b = jnp.clip(ly + bu, 0, 255)
    g = jnp.clip(ly + gu + gv, 0, 255)
    r = jnp.clip(ly + rv, 0, 255)
    return jnp.stack([b, g, r], axis=-1).astype(jnp.uint8)


def yuv420_to_bgr_np(yuv_flat: np.ndarray, h: int, w: int) -> np.ndarray:
    """Pure-numpy twin of :func:`yuv420_to_bgr` (host reference for tests
    and for hosts that want the conversion without a device)."""
    if h % 2 or w % 2:
        raise ValueError(f"yuv420_to_bgr_np supports even dims only, "
                         f"got {h}x{w}")
    cw, ch = (w + 1) // 2, (h + 1) // 2
    ysz, csz = h * w, cw * ch
    yuv_flat = np.asarray(yuv_flat)
    squeeze = yuv_flat.ndim == 1
    if squeeze:
        yuv_flat = yuv_flat[None]
    y = yuv_flat[:, :ysz].reshape(-1, h, w).astype(np.int64)
    u = yuv_flat[:, ysz:ysz + csz].reshape(-1, ch, cw).astype(np.int64)
    v = yuv_flat[:, ysz + csz:].reshape(-1, ch, cw).astype(np.int64)
    u = np.repeat(np.repeat(u, 2, axis=1), 2, axis=2)[:, :h, :w]
    v = np.repeat(np.repeat(v, 2, axis=1), 2, axis=2)[:, :h, :w]
    ly = (LY_COEF * (y - 16) + LY_ROUND) >> 16
    out = np.stack([
        np.clip(ly + ((BU_COEF * (u - 128)) >> 16), 0, 255),
        np.clip(ly + ((GU_COEF * (u - 128)) >> 16)
                + ((GV_COEF * (v - 128)) >> 16), 0, 255),
        np.clip(ly + ((RV_COEF * (v - 128)) >> 16), 0, 255),
    ], axis=-1).astype(np.uint8)
    return out[0] if squeeze else out
