"""Phase 5: validate the shm-decode + yuv420 fixes end to end on the chip.

Phase 3/4 found the relay transfer burns the single host core in kernel
time and device_put holds the GIL, so round 3's in-process prefetch ran
decode and transfer serially plus contention (negative overlap in
BENCH_r03).  Round 4 shipped the subprocess shm ring (c93e916) and the
1.5 B/px yuv420 transfer (5edb76f); this probe measures both against
their stage sums on the 10k bench clip so BENCH_r04's e2e block can be
wired to the winning configuration with numbers behind it.

Measures (all on the real TPU through the relay, values fetched):
  pipeline_bgr_s   segment_video_file default (shm subprocess, BGR 3 B/px)
  pipeline_yuv_s   segment_video_file transfer="yuv420" (1.5 B/px)
  decode_bgr_s     ParallelVideoReader x4 workers, stage only
  decode_yuv_s     NativeYUVSource sequential, stage only
  transfer_bgr_s   chunked device_put of BGR batches + reduction fetch
  transfer_yuv_s   chunked device_put of flat YUV vectors + fetch

Usage (TPU, solo):
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_e2e_phase5.py
"""

from __future__ import annotations

import itertools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FRAMES = int(os.environ.get("PROBE_FRAMES", 10000))
PRECISION = os.environ.get("PROBE_PRECISION", "uint8_chain")


def main() -> None:
    from cut_detection_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from bench import _make_bench_clip
    from cut_detection_tpu.data.native_video import NativeYUVSource
    from cut_detection_tpu.data.video import ParallelVideoReader, batch_frames
    from cut_detection_tpu.models.assembly import load_default_net
    from cut_detection_tpu.pipeline import classify_video, segment_video_file

    out: dict = {"frames": FRAMES, "precision": PRECISION,
                 "backend": jax.default_backend()}
    clip = _make_bench_clip(f"/tmp/cutdet_bench_{FRAMES}.mp4", FRAMES)
    net, _ = load_default_net(precision=PRECISION)

    # Warm both jitted steps (compiles billed here, not to the passes).
    t0 = time.perf_counter()
    classify_video(clip, net, frame_limit=256, print_every=0,
                   precision=PRECISION, decode_workers=4)
    out["warm_bgr_s"] = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    classify_video(clip, net, frame_limit=256, print_every=0,
                   precision=PRECISION, transfer="yuv420")
    out["warm_yuv_s"] = round(time.perf_counter() - t0, 1)

    # Pipeline passes (the artifact numbers).
    csv_bgr = "/tmp/probe5_bgr.csv"
    csv_yuv = "/tmp/probe5_yuv.csv"
    t0 = time.perf_counter()
    segment_video_file(clip, csv_bgr, net=net, print_every=0,
                       precision=PRECISION, decode_workers=4)
    out["pipeline_bgr_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    segment_video_file(clip, csv_yuv, net=net, print_every=0,
                       precision=PRECISION, transfer="yuv420")
    out["pipeline_yuv_s"] = round(time.perf_counter() - t0, 2)
    out["csv_equal"] = (open(csv_bgr, "rb").read()
                        == open(csv_yuv, "rb").read())

    # Stage: decode only (no device touch).
    t0 = time.perf_counter()
    src = ParallelVideoReader(clip, resize=256, num_threads=4)
    n = 0
    bgr_batches = []
    for b, valid in batch_frames(src, 128):
        n += valid
        if len(bgr_batches) < 16:
            bgr_batches.append(np.array(b))
    out["decode_bgr_s"] = round(time.perf_counter() - t0, 2)
    out["decode_bgr_frames"] = n

    t0 = time.perf_counter()
    ysrc = NativeYUVSource(clip, resize=256)
    yuv_batches = []
    cur = []
    n = 0
    for vec in ysrc:
        n += 1
        cur.append(vec)
        if len(cur) == 128:
            if len(yuv_batches) < 16:
                yuv_batches.append(np.stack(cur))
            cur = []
    out["decode_yuv_s"] = round(time.perf_counter() - t0, 2)
    out["decode_yuv_frames"] = n

    # Stage: transfer only (chunked puts + reduction fetch), recycling
    # the retained batches to cover FRAMES worth of uploads.
    def put_loop(batches, total_batches):
        it = itertools.islice(itertools.cycle(batches), total_batches)
        done = 0
        t0 = time.perf_counter()
        while True:
            chunk = list(itertools.islice(it, 8))
            if not chunk:
                break
            devs = [jax.device_put(b) for b in chunk]
            tot = jnp.int32(0)
            for d in devs:
                tot = tot + jnp.sum(d.reshape(-1)[:16].astype(jnp.int32))
            int(tot)
            done += len(chunk)
        return time.perf_counter() - t0

    nb = (FRAMES + 127) // 128
    out["transfer_bgr_s"] = round(put_loop(bgr_batches, nb), 2)
    out["transfer_yuv_s"] = round(put_loop(yuv_batches, nb), 2)
    out["bgr_batch_bytes"] = int(bgr_batches[0].nbytes)
    out["yuv_batch_bytes"] = int(yuv_batches[0].nbytes)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
