"""Measure the decode worker-scaling curve on this host (VERDICT r3 #4).

The v5e-8 projection previously assumed perfectly linear 8-worker decode
scaling from a 1-core host.  This probe measures total decode throughput
at 1/2/4 chunk-parallel workers (and 1 worker x N in-decoder ffmpeg
threads) on the bench clip, so the projection can carry a measured
contention factor instead of an assumption.  On this 1-core host the
total is expected ~flat across worker counts; the per-worker overhead
factor (total_at_4 / total_at_1) is the measured coordination cost the
projection derates by.

Pure host work - no JAX import, safe to run anytime.

Usage:
  PYTHONPATH= python scripts/probe_decode_scaling.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FRAMES = int(os.environ.get("PROBE_FRAMES", 5000))


def _decode_pass(clip: str, workers: int, backend: str = "cv2") -> dict:
    from cut_detection_tpu.data.video import (
        ParallelVideoReader,
        VideoFrameSource,
        batch_frames,
    )

    if workers > 1:
        src = ParallelVideoReader(clip, resize=256, num_threads=workers,
                                  backend=backend)
    elif backend == "native":
        from cut_detection_tpu.data.native_video import NativeVideoSource

        src = NativeVideoSource(clip, resize=256)
    else:
        src = VideoFrameSource(clip, resize=256)
    n = 0
    t0 = time.perf_counter()
    for _b, valid in batch_frames(src, 128):
        n += valid
    dt = time.perf_counter() - t0
    return {"workers": workers, "backend": backend, "frames": n,
            "seconds": round(dt, 2), "fps": round(n / dt, 1)}


def main() -> None:
    from bench import _make_bench_clip

    clip = _make_bench_clip(f"/tmp/cutdet_bench_{FRAMES}.mp4", FRAMES)
    out: dict = {"frames": FRAMES, "cores": os.cpu_count(), "points": []}
    for workers in (1, 2, 4):
        out["points"].append(_decode_pass(clip, workers))
    # Native sequential (in-decoder ffmpeg threading) for comparison.
    try:
        out["points"].append(_decode_pass(clip, 1, backend="native"))
    except Exception as e:  # native lib may be unbuilt
        out["native_error"] = f"{type(e).__name__}: {e}"
    base = out["points"][0]["fps"]
    out["scaling_vs_1worker"] = [
        round(p["fps"] / base, 3) for p in out["points"][:3]]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
