"""Pipeline benchmark tool: decode / transfer / classify / end-to-end rates.

The primary metric is frames/sec (BASELINE.md).  This tool breaks the
pipeline into its stages so regressions are attributable:

- ``decode``      host decode(+resize) only, sequential and chunk-parallel
- ``classify``    device-resident classify loop (no host I/O)
- ``e2e``         the full segment_video_file path

Prints one JSON line per stage.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

from cut_detection_tpu.utils.logging import setup_logging
from cut_detection_tpu.config import PRECISION_CHOICES


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("Benchmark the pipeline stage by stage.")
    p.add_argument("input_path", type=str, help="Video to benchmark with.")
    p.add_argument("--stages", nargs="+",
                   default=["decode", "classify", "e2e"],
                   choices=["decode", "classify", "e2e"])
    p.add_argument("--decode-workers", type=int, default=4)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--frame-limit", type=int, default=2000)
    p.add_argument("--precision",
                   choices=list(PRECISION_CHOICES),
                   default="float32")
    p.add_argument("--cpu", action="store_true")
    return p


def bench_decode(path: str, workers: int, limit: int) -> list[dict]:
    from cut_detection_tpu.data.video import (
        ParallelVideoReader,
        VideoFrameSource,
    )

    out = []
    for tag, make in (
        ("decode_sequential", lambda: VideoFrameSource(path, resize=256)),
        ("decode_parallel",
         lambda: ParallelVideoReader(path, resize=256, num_threads=workers)),
    ):
        src = make()
        n = 0
        t0 = time.perf_counter()
        for _ in src:
            n += 1
            if n >= limit:
                break
        dt = time.perf_counter() - t0
        out.append({"metric": tag, "value": round(n / dt, 1),
                    "unit": "frames/sec"})
    return out


def bench_classify(batch: int, precision: str, seconds: float = 8.0) -> dict:
    """Device-resident classify loop, shipping the same graph bench.py
    measures (preprocess folded into conv1 for the bf16 modes)."""
    import os
    import sys

    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    if root not in sys.path:
        sys.path.insert(0, root)
    import bench as root_bench

    fps = root_bench.bench_ours(batch, 128, seconds, precision=precision)
    return {"metric": f"classify_device ({precision})",
            "value": round(fps, 1), "unit": "frames/sec"}


def bench_e2e(path: str, workers: int, batch: int, limit: int,
              precision: str) -> dict:
    from cut_detection_tpu.pipeline import classify_video

    _, _, stats = classify_video(path, batch_size=batch, frame_limit=limit,
                                 decode_workers=workers, print_every=0,
                                 precision=precision)
    return {"metric": "e2e_classify", "value": round(stats.frames_per_sec, 1),
            "unit": "frames/sec", "frames": stats.frames}


def main(args=None) -> None:
    ns = build_parser().parse_args(args)
    setup_logging("WARNING")

    from cut_detection_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax

    if ns.cpu:
        from cut_detection_tpu.utils.platform import force_cpu

        force_cpu()

    results = []
    if "decode" in ns.stages:
        results.extend(bench_decode(ns.input_path, ns.decode_workers,
                                    ns.frame_limit))
    if "classify" in ns.stages:
        results.append(bench_classify(ns.batch_size, ns.precision))
    if "e2e" in ns.stages:
        results.append(bench_e2e(ns.input_path, ns.decode_workers,
                                 ns.batch_size, ns.frame_limit, ns.precision))
    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
