"""ctypes bindings for the native host runtime (native/cutdet_native.cpp).

Provides the C++ implementations of the host hot paths — uint8 bilinear
resize (bit-exact with OpenCV INTER_LINEAR), fused BGR->RGB normalize, and
the segmentation table build + merge loops — with transparent fallback to
the numpy/cv2 implementations when the library isn't built.

The library is built lazily with ``make`` on first use (g++ is in the
image); failures degrade gracefully to the Python paths.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libcutdet_native.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
        return os.path.isfile(_LIB_PATH)
    except Exception as e:  # missing toolchain, read-only fs, ...
        logger.debug("native build failed: %s", e)
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.isfile(_LIB_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as e:
            logger.debug("native load failed: %s", e)
            return None
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f32p = ctypes.POINTER(ctypes.c_float)
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.resize_bilinear_u8.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                           ctypes.c_int, u8p, ctypes.c_int,
                                           ctypes.c_int]
        lib.bgr_to_rgb_norm_f32.argtypes = [u8p, ctypes.c_int, f32p]
        lib.rle_encode.argtypes = [f32p, i32p, ctypes.c_int64, i64p, i64p,
                                   i64p, i64p, f32p]
        lib.rle_encode.restype = ctypes.c_int64
        lib.glue_orphans.argtypes = [i64p, i64p, i64p, i64p, f32p,
                                     ctypes.c_int64, ctypes.c_int64,
                                     ctypes.c_int64, ctypes.c_int]
        lib.glue_orphans.restype = ctypes.c_int64
        lib.combine_adjacent.argtypes = [i64p, i64p, i64p, i64p, f32p,
                                         ctypes.c_int64, ctypes.c_int]
        lib.combine_adjacent.restype = ctypes.c_int64
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _ptr(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def resize_bilinear_u8(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Native uint8 HWC resize, bit-exact with cv2 INTER_LINEAR."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim != 3:
        raise ValueError(f"expected HWC image, got shape {img.shape}")
    h, w, c = img.shape
    # Validate before crossing the C ABI: a zero source dim yields
    # negative tap indices (OOB reads), and negative output dims would
    # throw std::length_error across extern "C" -> std::terminate.
    if h <= 0 or w <= 0 or c <= 0 or out_h <= 0 or out_w <= 0:
        raise ValueError(
            f"resize dims must be positive: in {img.shape}, "
            f"out ({out_h}, {out_w})")
    out = np.empty((out_h, out_w, c), dtype=np.uint8)
    lib.resize_bilinear_u8(_ptr(img, ctypes.c_uint8), h, w, c,
                           _ptr(out, ctypes.c_uint8), out_h, out_w)
    return out


def bgr_to_rgb_norm(img_u8: np.ndarray) -> np.ndarray:
    """Native fused BGR->RGB + /255 (frameID/data.py:224-228 semantics)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    img_u8 = np.ascontiguousarray(img_u8, dtype=np.uint8)
    if img_u8.ndim < 1 or img_u8.shape[-1] != 3:
        # The C loop reads/writes 3 values per pixel; any other channel
        # count would run past both buffers (heap overflow).
        raise ValueError(
            f"expected ...x3 BGR input, got shape {img_u8.shape}")
    out = np.empty(img_u8.shape, dtype=np.float32)
    lib.bgr_to_rgb_norm_f32(_ptr(img_u8, ctypes.c_uint8),
                            int(np.prod(img_u8.shape[:-1])),
                            _ptr(out, ctypes.c_float))
    return out


def rle_encode(conf: np.ndarray, pred: np.ndarray) -> dict:
    """Native segment-table build; same dict contract as
    ``Segmentation._build_table``."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    conf = np.ascontiguousarray(conf, dtype=np.float32)
    pred = np.ascontiguousarray(pred, dtype=np.int32)
    if conf.ndim != 1 or conf.shape != pred.shape:
        # The C loop indexes both by conf's length; a shorter pred
        # would be an out-of-bounds read.
        raise ValueError(
            f"conf and pred must be equal-length 1-D arrays, got "
            f"{conf.shape} and {pred.shape}")
    n = conf.shape[0]
    start = np.empty(n, np.int64)
    end = np.empty(n, np.int64)
    typ = np.empty(n, np.int64)
    runlen = np.empty(n, np.int64)
    mean = np.empty(n, np.float32)
    k = lib.rle_encode(_ptr(conf, ctypes.c_float), _ptr(pred, ctypes.c_int32),
                       n, _ptr(start, ctypes.c_int64),
                       _ptr(end, ctypes.c_int64), _ptr(typ, ctypes.c_int64),
                       _ptr(runlen, ctypes.c_int64),
                       _ptr(mean, ctypes.c_float))
    return {
        "end_frames": end[:k].copy(),
        "frame_types": typ[:k].copy(),
        "run_lengths": runlen[:k].copy(),
        "start_frames": start[:k].copy(),
        "score_means": mean[:k].copy(),
    }


def _table_copies(te: dict):
    """Private working copies of the table's five arrays.

    The C merge loops memmove rows in place; ``ascontiguousarray`` would
    ALIAS the caller's (already-contiguous) arrays, scrambling the input
    ``te`` while the cleaned result comes back as a new dict — a caller
    keeping a reference to its table would silently read merged garbage.
    """
    return (np.array(te["start_frames"], np.int64, copy=True),
            np.array(te["end_frames"], np.int64, copy=True),
            np.array(te["frame_types"], np.int64, copy=True),
            np.array(te["run_lengths"], np.int64, copy=True),
            np.array(te["score_means"], np.float32, copy=True))


def glue_orphans(te: dict, real_threshold: int, blank_threshold: int,
                 bug_compat: bool = True) -> dict:
    """Native orphan gluing (on private copies); same contract as
    segmentation.glue.glue_orphans."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    start, end, typ, runlen, mean = _table_copies(te)
    k = lib.glue_orphans(_ptr(start, ctypes.c_int64),
                         _ptr(end, ctypes.c_int64),
                         _ptr(typ, ctypes.c_int64),
                         _ptr(runlen, ctypes.c_int64),
                         _ptr(mean, ctypes.c_float), start.shape[0],
                         real_threshold, blank_threshold, int(bug_compat))
    return {
        "end_frames": end[:k].copy(),
        "frame_types": typ[:k].copy(),
        "run_lengths": runlen[:k].copy(),
        "start_frames": start[:k].copy(),
        "score_means": mean[:k].copy(),
    }


def combine_adjacent(te: dict, bug_compat: bool = True) -> dict:
    """Native adjacent-merge (on private copies); same contract as
    segmentation.glue.combine_adjacent_segments."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    start, end, typ, runlen, mean = _table_copies(te)
    k = lib.combine_adjacent(_ptr(start, ctypes.c_int64),
                             _ptr(end, ctypes.c_int64),
                             _ptr(typ, ctypes.c_int64),
                             _ptr(runlen, ctypes.c_int64),
                             _ptr(mean, ctypes.c_float), start.shape[0],
                             int(bug_compat))
    return {
        "end_frames": end[:k].copy(),
        "frame_types": typ[:k].copy(),
        "run_lengths": runlen[:k].copy(),
        "start_frames": start[:k].copy(),
        "score_means": mean[:k].copy(),
    }
