"""Python bindings for the native libav decoder (native/video_decoder.cpp).

``NativeVideoSource`` mirrors ``VideoFrameSource``'s contract (uint8 BGR
HWC frames, reference resize rule, failure accounting) on top of the
first-party C++ decode stage instead of OpenCV.  Frames are byte-identical
to cv2's ffmpeg backend (both sws_scale to BGR24) — pinned by tests.
"""

from __future__ import annotations

import ctypes
import logging
import os
import threading
from typing import Iterator

import numpy as np

from cut_detection_tpu.geometry import reference_resize_dims

logger = logging.getLogger(__name__)

_LIB_PATH = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native", "libcutdet_decoder.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.isfile(_LIB_PATH):
            import subprocess

            try:
                subprocess.run(["make", "-C", os.path.dirname(_LIB_PATH)],
                               check=True, capture_output=True, timeout=180)
            except Exception as e:
                logger.debug("decoder build failed: %s", e)
                return None
        if not os.path.isfile(_LIB_PATH):
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as e:
            logger.debug("decoder load failed: %s", e)
            return None
        lib.vd_open.argtypes = [ctypes.c_char_p]
        lib.vd_open.restype = ctypes.c_void_p
        lib.vd_info.argtypes = [ctypes.c_void_p,
                                ctypes.POINTER(ctypes.c_int),
                                ctypes.POINTER(ctypes.c_int),
                                ctypes.POINTER(ctypes.c_double),
                                ctypes.POINTER(ctypes.c_int64)]
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.vd_read_frame.argtypes = [ctypes.c_void_p, u8p]
        lib.vd_read_stashed.argtypes = [ctypes.c_void_p, u8p]
        if hasattr(lib, "vd_read_frame_yuv"):  # stale .so tolerance
            lib.vd_read_frame_yuv.argtypes = [ctypes.c_void_p, u8p,
                                              ctypes.c_int, ctypes.c_int]
            lib.vd_read_stashed_yuv.argtypes = [ctypes.c_void_p, u8p,
                                                ctypes.c_int, ctypes.c_int]
            lib.vd_yuv420_to_bgr24.argtypes = [u8p, u8p, u8p, ctypes.c_int,
                                               ctypes.c_int, u8p]
        lib.vd_seek_frame.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        if hasattr(lib, "vd_seek_frame_from"):  # stale .so tolerance
            lib.vd_seek_frame_from.argtypes = [ctypes.c_void_p,
                                               ctypes.c_int64,
                                               ctypes.c_int64]
        lib.vd_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def yuv_available() -> bool:
    """True when the built .so has the planar-YUV420 entry points."""
    lib = _load()
    return lib is not None and hasattr(lib, "vd_read_frame_yuv")


def yuv420_to_bgr24_host(y, u, v):
    """Host-side swscale yuv420p->bgr24 (the oracle ops/yuv.py emulates)."""
    lib = _load()
    if lib is None or not hasattr(lib, "vd_yuv420_to_bgr24"):
        raise RuntimeError("native decoder (with YUV entry points) "
                           "unavailable")
    y = np.ascontiguousarray(y, np.uint8)
    u = np.ascontiguousarray(u, np.uint8)
    v = np.ascontiguousarray(v, np.uint8)
    h, w = y.shape
    out = np.empty((h, w, 3), np.uint8)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    if not lib.vd_yuv420_to_bgr24(
            y.ctypes.data_as(u8p), u.ctypes.data_as(u8p),
            v.ctypes.data_as(u8p), w, h, out.ctypes.data_as(u8p)):
        raise RuntimeError("vd_yuv420_to_bgr24 failed")
    return out


class NativeYUVSource:
    """Sequential decode to packed planar YUV420 at the TARGET size.

    The transfer-halving counterpart of ``NativeVideoSource``: one
    swscale pass per frame scales the decoded frame to the reference
    resize dims IN YUV SPACE (1.5 B/px both sides — cheaper than
    BGR-convert + separate resize) and yields the packed planes as a
    flat uint8 vector (``ops.yuv.yuv420_nbytes`` long).  The YUV->BGR
    conversion then runs on device (ops/yuv.py, bit-exact swscale
    emulation), so only 1.5 B/px ever crosses host->device.

    Note the composition differs from the byte-parity path by the
    resize SPACE (YUV vs BGR, frameID/data.py:220-222): the fast-path
    rungs gate it on the accuracy corpus instead (tests/test_yuv.py,
    test_eval_corpus.py).
    """

    def __init__(self, file_path: str, resize: int | None = 256):
        lib = _load()
        if lib is None or not hasattr(lib, "vd_read_frame_yuv"):
            raise RuntimeError("native decoder (with YUV entry points) "
                               "unavailable")
        self._lib = lib
        self._handle = lib.vd_open(file_path.encode())
        if not self._handle:
            raise IOError(f"could not open {file_path}")
        w = ctypes.c_int()
        h = ctypes.c_int()
        fps = ctypes.c_double()
        n = ctypes.c_int64()
        lib.vd_info(self._handle, ctypes.byref(w), ctypes.byref(h),
                    ctypes.byref(fps), ctypes.byref(n))
        self.video_info = {"fps": int(fps.value), "length": int(n.value),
                           "width": int(w.value), "height": int(h.value)}
        self.frames_read = 0
        self.frames_failed = 0
        self._stashed = False
        if resize is not None:
            self.out_width, self.out_height = reference_resize_dims(
                self.video_info["width"], self.video_info["height"], resize)
        else:
            self.out_width = self.video_info["width"]
            self.out_height = self.video_info["height"]
        from cut_detection_tpu.geometry import yuv420_nbytes

        self.frame_nbytes = yuv420_nbytes(self.out_height, self.out_width)

    def seek(self, frame_index: int) -> None:
        """Position so the next vector returned is frame ``frame_index``.

        Same anchored retry contract as ``NativeVideoSource.seek`` (the
        stash holds the decoded target frame; the next read scales it to
        the YUV target size instead of BGR).  Enables chunk-parallel YUV
        decode (``ParallelVideoReader(backend="yuv")``).
        """
        seek_from = getattr(self._lib, "vd_seek_frame_from", None)
        if seek_from is None:  # stale pre-anchor .so: historic behavior
            ret = self._lib.vd_seek_frame(self._handle, frame_index)
            if ret == 0:
                raise IOError(f"seek to frame {frame_index} failed")
            self._stashed = ret == 2
            self.frames_read = frame_index
            return
        anchors = [frame_index, max(0, frame_index - 64),
                   max(0, frame_index - 512), 0]
        ret = 0
        for anchor in dict.fromkeys(anchors):
            ret = seek_from(self._handle, frame_index, anchor)
            if ret == 2:
                self._stashed = True
                self.frames_read = frame_index
                return
            if ret == 0:
                break
        raise IOError(
            f"seek to frame {frame_index} "
            f"{'overshot from every anchor' if ret == 3 else 'failed'}")

    def __iter__(self) -> Iterator[np.ndarray]:
        return self

    def __next__(self) -> np.ndarray:
        buf = np.empty((self.frame_nbytes,), dtype=np.uint8)
        ptr = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        if self._stashed:
            ret = self._lib.vd_read_stashed_yuv(self._handle, ptr,
                                                self.out_width,
                                                self.out_height)
            self._stashed = False
        else:
            ret = self._lib.vd_read_frame_yuv(self._handle, ptr,
                                              self.out_width,
                                              self.out_height)
        if not ret:
            if self.frames_read < self.video_info["length"]:
                self.frames_failed = (self.video_info["length"]
                                      - self.frames_read)
                logger.warning(
                    "Native YUV decode ended early: %d/%d frames "
                    "(%d missing).", self.frames_read,
                    self.video_info["length"], self.frames_failed)
            raise StopIteration
        self.frames_read += 1
        return buf

    def __len__(self) -> int:
        return self.video_info["length"]

    def close(self) -> None:
        if self._handle:
            self._lib.vd_close(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover - gc path
        try:
            self.close()
        except Exception:
            pass


class NativeVideoSource:
    """Sequential decode via the native libav stage.

    Same interface as ``data.video.VideoFrameSource``: yields uint8 BGR HWC
    frames, resized on host when ``resize`` is set (using the bit-exact
    native resize when available, else cv2).
    """

    def __init__(self, file_path: str, resize: int | None = None):
        lib = _load()
        if lib is None:
            raise RuntimeError("native decoder unavailable")
        self._lib = lib
        self._handle = lib.vd_open(file_path.encode())
        if not self._handle:
            raise IOError(f"could not open {file_path}")
        w = ctypes.c_int()
        h = ctypes.c_int()
        fps = ctypes.c_double()
        n = ctypes.c_int64()
        lib.vd_info(self._handle, ctypes.byref(w), ctypes.byref(h),
                    ctypes.byref(fps), ctypes.byref(n))
        # Match open_video's info dict incl. int-truncated fps
        # (frameID/data.py:20).
        self.video_info = {"fps": int(fps.value), "length": int(n.value),
                           "width": int(w.value), "height": int(h.value)}
        # frames_read tracks the stream POSITION (seek() fast-forwards
        # it), so the early-end warning compares position vs length
        # instead of reporting skipped frames as losses.
        self.frames_read = 0
        self.frames_failed = 0
        self._stashed = False
        if resize is not None:
            self.new_width, self.new_height = reference_resize_dims(
                self.video_info["width"], self.video_info["height"], resize)
        else:
            self.new_width = self.new_height = None

    def seek(self, frame_index: int) -> None:
        """Position so the next frame returned is ``frame_index``.

        Keyframe seek + decode-forward.  When the pts->index mapping
        jumps PAST the target (VFR / NTSC-rate rounding), the decoder
        reports overshoot (return code 3) instead of silently handing
        back a later frame, and the seek retries from progressively
        earlier anchors — ending at frame 0, where decode-forward is
        exact by construction.  Raises IOError on hard failure so no
        caller ever receives a mispositioned stream silently.
        """
        seek_from = getattr(self._lib, "vd_seek_frame_from", None)
        if seek_from is None:  # stale pre-anchor .so: historic behavior
            ret = self._lib.vd_seek_frame(self._handle, frame_index)
            if ret == 0:
                raise IOError(f"seek to frame {frame_index} failed")
            self._stashed = ret == 2
            self.frames_read = frame_index
            return
        anchors = [frame_index, max(0, frame_index - 64),
                   max(0, frame_index - 512), 0]
        ret = 0
        for anchor in dict.fromkeys(anchors):  # dedup, keep order
            ret = seek_from(self._handle, frame_index, anchor)
            if ret == 2:
                self._stashed = True
                self.frames_read = frame_index
                return
            if ret == 0:
                break  # hard failure; earlier anchors won't help
        raise IOError(
            f"seek to frame {frame_index} "
            f"{'overshot from every anchor' if ret == 3 else 'failed'}")

    def _resize(self, frame: np.ndarray) -> np.ndarray:
        if self.new_width is None:
            return frame
        # cv2's hand-vectorized resize is ~25% faster than our scalar C++
        # implementation; both are bit-identical, so prefer cv2 when
        # present and fall back to the native path.
        from cut_detection_tpu.data.video import _host_resize

        return _host_resize(frame, self.new_width, self.new_height)

    def __iter__(self) -> Iterator[np.ndarray]:
        return self

    def __next__(self) -> np.ndarray:
        h, w = self.video_info["height"], self.video_info["width"]
        frame = np.empty((h, w, 3), dtype=np.uint8)
        ptr = frame.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        if self._stashed:
            ret = self._lib.vd_read_stashed(self._handle, ptr)
            self._stashed = False
        else:
            ret = self._lib.vd_read_frame(self._handle, ptr)
        if not ret:
            if self.frames_read < self.video_info["length"]:
                self.frames_failed = (self.video_info["length"]
                                      - self.frames_read)
                logger.warning(
                    "Native decode ended early: %d/%d frames (%d missing).",
                    self.frames_read, self.video_info["length"],
                    self.frames_failed)
            raise StopIteration
        self.frames_read += 1
        return self._resize(frame)

    def __len__(self) -> int:
        return self.video_info["length"]

    def close(self) -> None:
        if self._handle:
            self._lib.vd_close(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover - gc path
        try:
            self.close()
        except Exception:
            pass
