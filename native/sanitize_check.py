"""Sanitizer driver for the native host runtime (run under tsan/asan).

Loads a sanitizer-instrumented build of libcutdet_native.so (and the
libav decoder when given) via ctypes and exercises the concurrency
pattern the product actually uses — multiple Python threads each calling
into the library (resize / RLE+merge; per-thread decoder handles with
seeks, like ParallelVideoReader's workers) — so data races and memory
errors surface as sanitizer reports (non-zero exit).

Standalone on purpose: numpy + ctypes only, no package import, so the
check runs in a bare CI job.  Invoke through the Makefile targets:

    make -C native sanitize-tsan   # thread sanitizer, ops + decoder
    make -C native sanitize-asan   # address sanitizer, ops + decoder

(Those targets handle the LD_PRELOAD of the sanitizer runtime that
loading an instrumented .so into an uninstrumented python requires.)
"""

from __future__ import annotations

import ctypes
import os
import sys
import threading

import numpy as np

U8P = ctypes.POINTER(ctypes.c_uint8)
F32P = ctypes.POINTER(ctypes.c_float)
I32P = ctypes.POINTER(ctypes.c_int32)
I64P = ctypes.POINTER(ctypes.c_int64)


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def check_ops(lib_path: str, threads: int = 8, iters: int = 20) -> None:
    lib = ctypes.CDLL(lib_path)
    lib.resize_bilinear_u8.argtypes = [U8P, ctypes.c_int, ctypes.c_int,
                                       ctypes.c_int, U8P, ctypes.c_int,
                                       ctypes.c_int]
    lib.rle_encode.argtypes = [F32P, I32P, ctypes.c_int64, I64P, I64P,
                               I64P, I64P, F32P]
    lib.rle_encode.restype = ctypes.c_int64
    lib.glue_orphans.argtypes = [I64P, I64P, I64P, I64P, F32P,
                                 ctypes.c_int64, ctypes.c_int64,
                                 ctypes.c_int64, ctypes.c_int]
    lib.glue_orphans.restype = ctypes.c_int64
    lib.combine_adjacent.argtypes = [I64P, I64P, I64P, I64P, F32P,
                                     ctypes.c_int64, ctypes.c_int]
    lib.combine_adjacent.restype = ctypes.c_int64

    rng = np.random.default_rng(0)
    src = rng.integers(0, 256, size=(360, 640, 3), dtype=np.uint8)
    conf = rng.random(5000).astype(np.float32)
    pred = rng.integers(0, 3, size=5000).astype(np.int32)
    errors = []

    def worker(tid: int) -> None:
        try:
            out = np.empty((144, 256, 3), np.uint8)
            for _ in range(iters):
                # Shared read-only input, private output (the product's
                # pattern: N decode threads resizing concurrently).
                lib.resize_bilinear_u8(_ptr(src, ctypes.c_uint8), 360, 640,
                                       3, _ptr(out, ctypes.c_uint8), 144,
                                       256)
                n = len(conf)
                start = np.empty(n, np.int64)
                end = np.empty(n, np.int64)
                typ = np.empty(n, np.int64)
                length = np.empty(n, np.int64)
                mean = np.empty(n, np.float32)
                cnt = lib.rle_encode(_ptr(conf, ctypes.c_float),
                                     _ptr(pred, ctypes.c_int32), n,
                                     _ptr(start, ctypes.c_int64),
                                     _ptr(end, ctypes.c_int64),
                                     _ptr(typ, ctypes.c_int64),
                                     _ptr(length, ctypes.c_int64),
                                     _ptr(mean, ctypes.c_float))
                cnt = lib.glue_orphans(_ptr(start, ctypes.c_int64),
                                       _ptr(end, ctypes.c_int64),
                                       _ptr(typ, ctypes.c_int64),
                                       _ptr(length, ctypes.c_int64),
                                       _ptr(mean, ctypes.c_float),
                                       cnt, 100, 10, 1)
                lib.combine_adjacent(_ptr(start, ctypes.c_int64),
                                     _ptr(end, ctypes.c_int64),
                                     _ptr(typ, ctypes.c_int64),
                                     _ptr(length, ctypes.c_int64),
                                     _ptr(mean, ctypes.c_float), cnt, 1)
        except Exception as e:  # pragma: no cover - surfaced via exit code
            errors.append((tid, e))

    ts = [threading.Thread(target=worker, args=(t,)) for t in range(threads)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    if errors:
        raise SystemExit(f"ops check failed: {errors}")
    print(f"ops: {threads} threads x {iters} iters OK")


def check_decoder(lib_path: str, video: str, threads: int = 4) -> None:
    lib = ctypes.CDLL(lib_path)
    lib.vd_open.restype = ctypes.c_void_p
    lib.vd_open.argtypes = [ctypes.c_char_p]
    lib.vd_info.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int),
                            ctypes.POINTER(ctypes.c_int),
                            ctypes.POINTER(ctypes.c_double),
                            ctypes.POINTER(ctypes.c_int64)]
    lib.vd_read_frame.argtypes = [ctypes.c_void_p, U8P]
    lib.vd_seek_frame.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.vd_read_stashed.argtypes = [ctypes.c_void_p, U8P]
    lib.vd_close.argtypes = [ctypes.c_void_p]
    errors = []

    def worker(tid: int) -> None:
        # ParallelVideoReader's pattern: a PRIVATE handle per thread,
        # seek to a chunk start, decode sequentially.
        try:
            h = lib.vd_open(video.encode())
            if not h:
                raise RuntimeError("open failed")
            w = ctypes.c_int()
            hh = ctypes.c_int()
            fps = ctypes.c_double()
            length = ctypes.c_int64()
            lib.vd_info(h, ctypes.byref(w), ctypes.byref(hh),
                        ctypes.byref(fps), ctypes.byref(length))
            buf = np.empty((hh.value, w.value, 3), np.uint8)
            start = (int(length.value) // threads) * tid
            # Stash protocol: seek returning 2 means the target frame is
            # already decoded; fetch it with vd_read_stashed.
            ret = lib.vd_seek_frame(h, start)
            if ret == 2:
                lib.vd_read_stashed(h, _ptr(buf, ctypes.c_uint8))
            elif ret == 1:
                lib.vd_read_frame(h, _ptr(buf, ctypes.c_uint8))
            for _ in range(min(50, int(length.value) // threads)):
                if lib.vd_read_frame(h, _ptr(buf, ctypes.c_uint8)) <= 0:
                    break
            lib.vd_close(h)
        except Exception as e:  # pragma: no cover
            errors.append((tid, e))

    ts = [threading.Thread(target=worker, args=(t,)) for t in range(threads)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    if errors:
        raise SystemExit(f"decoder check failed: {errors}")
    print(f"decoder: {threads} threads OK")


def main() -> None:
    # dlopen ignores the cwd for bare names; make paths absolute.
    ops_lib = os.path.abspath(sys.argv[1])
    check_ops(ops_lib)
    if len(sys.argv) > 3:
        dec_lib, video = (os.path.abspath(p) for p in sys.argv[2:4])
        if os.path.isfile(dec_lib) and os.path.isfile(video):
            check_decoder(dec_lib, video)
        else:
            print("decoder check skipped (lib or video missing)")
    print("sanitize_check OK")


if __name__ == "__main__":
    main()
