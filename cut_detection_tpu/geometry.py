"""Pure-math geometry helpers shared by the data and ops layers.

Deliberately dependency-free (no jax, no numpy): the decode SUBPROCESS
(data/shm_loader.py) imports the data layer at spawn, and every module
on that import path must stay jax-free — a jax import costs ~1.5 s of
child startup on a 1-core host, billed to every video's end-to-end
time.  ``ops.resize`` / ``ops.yuv`` re-export these names for their
device-side counterparts' callers.
"""

from __future__ import annotations


def reference_resize_dims(width: int, height: int, resize: int) -> tuple[int, int]:
    """(new_w, new_h) exactly as frameID/data.py:199-202 computes them.

    Note the reference computes ``int(height * (resize / width))`` — a float
    multiply then truncation — so we replicate that expression verbatim
    rather than using integer arithmetic.
    """
    new_w = resize
    new_h = int(height * (new_w / width))
    return new_w, new_h


def yuv420_nbytes(h: int, w: int) -> int:
    """Bytes of a packed planar-YUV420 frame at ``h`` x ``w``.

    Y plane (h*w) + two quarter-size chroma planes, each padded to its
    ceil'd half dimensions — the exact layout ``ops.yuv.pack_yuv420``
    produces and ``native/video_decoder.cpp:vd_read_frame_yuv`` writes.
    """
    cw, ch = (w + 1) // 2, (h + 1) // 2
    return h * w + 2 * cw * ch
