"""Subprocess decode feeding a shared-memory batch ring.

Why a separate PROCESS (round-4 e2e overlap fix): on the axon-relay TPU,
host->device transfers block **with the GIL held** — measured by
``scripts/probe_e2e_phase2.py``: the put loop shows cpu_frac ~0.08 (the
host CPU is ~92% idle waiting on the tunnel), yet a decode THREAD gets
essentially no cycles during it (hand-rolled thread overlap ran at the
serial sum).  So the in-process ``data/loader.PrefetchLoader`` cannot
overlap decode with transfer no matter its depth.  A decode subprocess
is immune: the OS schedules it while the parent blocks inside the relay
send, GIL or not.

Frames cross the process boundary through ``multiprocessing.shared_memory``
slots — the child decodes straight into a ring of ``slots`` batch-sized
uint8 blocks, the parent yields zero-copy views (or copies, on backends
whose ``device_put`` may alias host memory — the JAX CPU backend can
zero-copy numpy buffers, so tests force ``copy_out=True``).  Flow
control: a ``free`` queue of slot ids (parent -> child) and a ``ready``
queue of (slot, valid) messages (child -> parent); the child can run at
most ``slots`` batches ahead, bounding host RAM at slots x batch bytes.

The child is spawned (never forked — the parent holds a live TPU/relay
client) with the axon sitecustomize stripped from PYTHONPATH and
``JAX_PLATFORMS=cpu``, so even its transitive jax import can never dial
the tunnel (one JAX process at a time is a hard environment rule).

Reference behavior matched: the batches are exactly what
``video.batch_frames`` yields in-process (same sources, same padding),
so CSV parity is unchanged by construction; tests cross-check both paths.
"""

from __future__ import annotations

import logging
import multiprocessing as mp
import os
import queue as queue_mod
import time
from multiprocessing import shared_memory

import numpy as np

logger = logging.getLogger(__name__)

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _producer_main(path: str, kw: dict, shm_names: list, slot_shape: tuple,
                   free_q, ready_q) -> None:
    """Child process: decode batches into the shared-memory ring.

    Runs with a tunnel-proof environment (see module docstring).  Sends
    ("batch", slot, valid) per batch, then ("done", stats) — or
    ("error", message) on any failure, so the parent re-raises instead
    of hanging on a silently dead child.
    """
    shms = []
    try:
        from cut_detection_tpu.data import video as v

        if kw.get("transfer") == "yuv420":
            if kw["decode_workers"] > 1:
                src = v.ParallelVideoReader(
                    path, resize=kw["resize"],
                    num_threads=kw["decode_workers"],
                    chunk_frames=kw["decode_chunk_frames"], backend="yuv")
            else:
                from cut_detection_tpu.data.native_video import (
                    NativeYUVSource,
                )

                src = NativeYUVSource(path, resize=kw["resize"])
        elif kw["decode_workers"] > 1:
            src = v.ParallelVideoReader(
                path, resize=kw["resize"], num_threads=kw["decode_workers"],
                chunk_frames=kw["decode_chunk_frames"],
                backend=kw["decoder"])
        elif kw["decoder"] == "native":
            from cut_detection_tpu.data.native_video import NativeVideoSource

            src = NativeVideoSource(path, resize=kw["resize"])
        else:
            src = v.VideoFrameSource(path, resize=kw["resize"])
        shms = [shared_memory.SharedMemory(name=n) for n in shm_names]
        views = [np.ndarray(slot_shape, np.uint8, buffer=s.buf)
                 for s in shms]
        for batch, valid in v.batch_frames(src, slot_shape[0]):
            if batch.shape != slot_shape:
                raise RuntimeError(
                    f"decoded batch shape {batch.shape} != expected "
                    f"{slot_shape} (video stream changed size mid-file?)")
            slot = free_q.get()
            if slot is None:  # parent closed early (e.g. --frame-limit)
                return
            views[slot][...] = batch
            ready_q.put(("batch", slot, int(valid)))
        ready_q.put(("done", {
            "frames_failed": int(getattr(src, "frames_failed", 0))}))
    except BaseException as e:  # noqa: BLE001 — child must report, not die mute
        import traceback

        try:
            ready_q.put(("error", f"{type(e).__name__}: {e}\n"
                         f"{traceback.format_exc()}"))
        except Exception:
            pass
    finally:
        for s in shms:
            try:
                s.close()
            except Exception:
                pass


class ShmDecodeLoader:
    """Iterable of ``(batch, valid)`` decoded in a subprocess.

    Drop-in for the ``PrefetchLoader(batch_frames(source, B))`` pattern in
    ``pipeline.classify_video``; exposes ``video_info`` / ``length`` /
    ``frames_failed`` like the in-process sources.  Single-use.

    ``copy_out=True`` yields private copies instead of ring views — REQUIRED
    when the consumer's ``device_put`` may alias host memory (JAX CPU
    backend); on TPU/relay backends ``device_put`` returns only after the
    bytes left the buffer, so views are safe and save a memcpy.
    """

    def __init__(self, input_path: str, *, batch_size: int = 128,
                 resize: int | None = 256, decode_workers: int = 1,
                 decode_chunk_frames: int = 256, decoder: str = "cv2",
                 slots: int | None = None, copy_out: bool = False,
                 transfer: str = "bgr"):
        from cut_detection_tpu.data.video import open_video

        if decoder == "auto":
            from cut_detection_tpu.data import native_video

            decoder = "native" if native_video.available() else "cv2"
        cap, info = open_video(input_path)  # probe metadata (and fail early)
        try:
            cap.release()
        except Exception:
            pass
        self.video_info = info
        self.length = info["length"]
        self.frames_failed = 0
        if resize is not None:
            from cut_detection_tpu.geometry import reference_resize_dims

            w, h = reference_resize_dims(info["width"], info["height"],
                                         resize)
        else:
            w, h = info["width"], info["height"]
        self.frame_hw = (h, w)
        if slots is None:
            try:
                slots = int(os.environ.get("CUTDET_DECODE_SLOTS") or 6)
            except ValueError:
                slots = 6
        slots = max(2, slots)
        if transfer == "yuv420":
            from cut_detection_tpu.data import native_video
            from cut_detection_tpu.geometry import yuv420_nbytes

            if not native_video.yuv_available():
                raise RuntimeError(
                    "transfer='yuv420' needs the native decoder with YUV "
                    "entry points (make -C native)")
            if h % 2 or w % 2:
                raise ValueError(
                    f"transfer='yuv420' needs even target dims, got {h}x{w} "
                    "(odd sizes take swscale's interpolating path — use "
                    "the BGR transfer)")
            self._slot_shape = (batch_size, yuv420_nbytes(h, w))
        elif transfer == "bgr":
            self._slot_shape = (batch_size, h, w, 3)
        else:
            raise ValueError(f"unknown transfer mode {transfer!r}")
        self._copy_out = copy_out
        self._closed = False
        self._consumed = False
        # Startup latency instrumentation: wall time from construction to
        # the first decoded batch being available (spawn + child imports +
        # first batch decode).  Populated lazily by _drain.
        self._t_init = time.perf_counter()
        self.startup_s: float | None = None
        nbytes = int(np.prod(self._slot_shape))
        self._shms = [shared_memory.SharedMemory(create=True, size=nbytes)
                      for _ in range(slots)]
        self._views = [np.ndarray(self._slot_shape, np.uint8, buffer=s.buf)
                       for s in self._shms]
        ctx = mp.get_context("spawn")
        self._free = ctx.Queue()
        self._ready = ctx.Queue()
        for i in range(slots):
            self._free.put(i)
        kw = {"resize": resize, "decode_workers": decode_workers,
              "decode_chunk_frames": decode_chunk_frames, "decoder": decoder,
              "transfer": transfer}
        # Tunnel-proof child env: spawn inherits os.environ, so swap in a
        # PYTHONPATH without the axon sitecustomize (keeping the repo
        # importable) and pin the child's jax to CPU for the spawn window.
        saved = {k: os.environ.get(k)
                 for k in ("PYTHONPATH", "JAX_PLATFORMS")}
        pyp = [p for p in (saved["PYTHONPATH"] or "").split(os.pathsep)
               if p and "axon_site" not in os.path.basename(p.rstrip("/"))]
        if _REPO_ROOT not in pyp:
            pyp.insert(0, _REPO_ROOT)
        try:
            os.environ["PYTHONPATH"] = os.pathsep.join(pyp)
            os.environ["JAX_PLATFORMS"] = "cpu"
            self._proc = ctx.Process(
                target=_producer_main,
                args=(input_path, kw, [s.name for s in self._shms],
                      self._slot_shape, self._free, self._ready),
                daemon=True)
            self._proc.start()
        finally:
            for k, old in saved.items():
                if old is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = old

    def __iter__(self):
        if self._consumed:
            raise RuntimeError("ShmDecodeLoader is single-use; construct a "
                               "new one to iterate again")
        self._consumed = True
        return self._drain()

    def _drain(self):
        try:
            while True:
                try:
                    msg = self._ready.get(timeout=600.0)
                except queue_mod.Empty:
                    raise RuntimeError(
                        "decode subprocess produced nothing for 600s "
                        f"(alive={self._proc.is_alive()})") from None
                kind = msg[0]
                if kind == "batch":
                    if self.startup_s is None:
                        self.startup_s = time.perf_counter() - self._t_init
                    _, slot, valid = msg
                    if self._copy_out:
                        out = self._views[slot].copy()
                        self._free.put(slot)
                        yield out, valid
                    else:
                        yield self._views[slot], valid
                        # The consumer is done with the view once it asks
                        # for the next batch (device_put has returned).
                        self._free.put(slot)
                elif kind == "done":
                    self.frames_failed = msg[1]["frames_failed"]
                    return
                else:
                    raise RuntimeError(f"decode subprocess failed: {msg[1]}")
        finally:
            self.close()

    def close(self) -> None:
        """Stop the child and release the shared-memory ring (idempotent)."""
        if self._closed:
            return
        self._closed = True
        try:
            self._free.put(None)
        except Exception:
            pass
        proc = getattr(self, "_proc", None)
        if proc is not None:
            proc.join(timeout=15)
            if proc.is_alive():
                logger.warning("decode subprocess did not exit; terminating")
                proc.terminate()
                proc.join(timeout=5)
        # Drain queue feeder threads so close() doesn't leak them.
        for q in (self._free, self._ready):
            try:
                q.cancel_join_thread()
                q.close()
            except Exception:
                pass
        for s in self._shms:
            try:
                s.close()
                s.unlink()
            except Exception:
                pass

    def __del__(self):  # last-resort cleanup; close() is the real API
        try:
            self.close()
        except Exception:
            pass
