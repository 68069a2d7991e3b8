"""Sequential-decode throughput vs in-decoder threading (VERDICT r2 #5).

Measures decode+resize fps for each backend under different ffmpeg
thread settings, each in a fresh subprocess (cv2 reads
$OPENCV_FFMPEG_CAPTURE_OPTIONS at capture-open; a clean process keeps
the comparison honest).  On this environment's 1-core host in-decoder
threading cannot win — the point is the measured number either way,
recorded in docs/PERFORMANCE.md, and the lever itself for multi-core
TPU-VM hosts where it multiplies with --decode-workers chunking.

Usage: PYTHONPATH=/root/repo python scripts/bench_decode.py [frames]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

WORKER = r"""
import sys, time
sys.path.insert(0, "/root/repo")
backend, clip = sys.argv[1], sys.argv[2]
if backend == "cv2":
    from cut_detection_tpu.data.video import VideoFrameSource
    src = VideoFrameSource(clip, resize=256)
else:
    from cut_detection_tpu.data.native_video import NativeVideoSource
    src = NativeVideoSource(clip, resize=256)
t0 = time.perf_counter(); n = 0
for _ in src:
    n += 1
print(n / (time.perf_counter() - t0))
"""


# Interleaved A/B in ONE process (VERDICT r4 #6: the "decode-to-YUV is
# faster" claim must be substantiated back-to-back, not across drifting
# windows): alternates full decode passes BGR(cv2) / BGR(native) /
# YUV(native, target-size) and reports per-repeat rates + medians.
WORKER_AB = r"""
import json, statistics, sys, time
sys.path.insert(0, "/root/repo")
clip, reps = sys.argv[1], int(sys.argv[2])
from cut_detection_tpu.data.video import VideoFrameSource
from cut_detection_tpu.data.native_video import (
    NativeVideoSource, NativeYUVSource, yuv_available)

def run(make):
    src = make(); t0 = time.perf_counter(); n = 0
    for _ in src:
        n += 1
    dt = time.perf_counter() - t0
    if hasattr(src, "close"):
        src.close()
    return n / dt

cfgs = {"bgr_cv2": lambda: VideoFrameSource(clip, resize=256),
        "bgr_native": lambda: NativeVideoSource(clip, resize=256)}
if yuv_available():
    cfgs["yuv_native"] = lambda: NativeYUVSource(clip, resize=256)
rates = {k: [] for k in cfgs}
for r in range(reps):
    for k, mk in cfgs.items():
        rates[k].append(round(run(mk), 1))
print(json.dumps({k: {"reps": v,
                      "median": round(statistics.median(v), 1)}
                  for k, v in rates.items()}))
"""


def run_ab(clip: str, reps: int = 3) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo"
    out = subprocess.run([sys.executable, "-c", WORKER_AB, clip, str(reps)],
                         capture_output=True, text=True, env=env,
                         timeout=1200)
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-500:])
    return json.loads(out.stdout.strip().splitlines()[-1])


def run_one(backend: str, clip: str, threads: str | None) -> float:
    env = dict(os.environ)
    env.pop("OPENCV_FFMPEG_CAPTURE_OPTIONS", None)
    if threads is not None:
        env["OPENCV_FFMPEG_CAPTURE_OPTIONS"] = f"threads;{threads}"
    env["PYTHONPATH"] = "/root/repo"
    out = subprocess.run([sys.executable, "-c", WORKER, backend, clip],
                         capture_output=True, text=True, env=env,
                         timeout=600)
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-500:])
    return float(out.stdout.strip().splitlines()[-1])


def main():
    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    sys.path.insert(0, "/root/repo")
    from bench import _make_bench_clip

    clip = _make_bench_clip(
        os.path.join(tempfile.gettempdir(), f"cutdet_bench_{frames}.mp4"),
        frames)
    res = {}
    for threads in ("1", "0"):  # 1 = single-threaded, 0 = auto
        best = max(run_one("cv2", clip, threads) for _ in range(3))
        res[f"cv2_threads_{threads}"] = round(best, 1)
    for name in ("native",):
        try:
            res[name] = round(max(run_one(name, clip, None)
                                  for _ in range(3)), 1)
        except Exception as e:
            res[name] = f"unavailable: {e}"[:120]
    res["cores"] = os.cpu_count()
    try:
        res["ab_one_process"] = run_ab(clip)
    except Exception as e:
        res["ab_one_process"] = f"failed: {e}"[:200]
    print(json.dumps(res))


if __name__ == "__main__":
    main()
