"""Who owns the host core during relay transfers?  (round-4 e2e digging)

Two prior probes disagreed: phase 2 measured the put loop's own
process_time fraction at ~0.08 (process mostly waiting), while the
round-3 negative overlap implied the core is saturated during
transfers.  This probe settles it with SYSTEM-WIDE accounting
(/proc/stat busy fraction) sampled around three passes:

  transfer   chunked device_put loop of BGR batches + per-chunk fetch
  decode     pure cv2 sequential decode (known CPU-bound, sanity ~1.0)
  pipeline   segment_video_file with subprocess decode (the product)

If the transfer pass shows system-wide busy << 1, the core IS idle
during transfers and decode/transfer overlap is physically available —
the pipeline's job is to claim it.  If busy ~= 1 (kernel vsock + relay
shim), overlap is impossible on a 1-core host and the bench's
efficiency ceiling is 0 by physics, which the artifact then documents.

Usage (TPU, solo):
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_transfer_cpu.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FRAMES = int(os.environ.get("PROBE_FRAMES", 5000))
PRECISION = os.environ.get("PROBE_PRECISION", "uint8_chain")


def _stat():
    with open("/proc/stat") as f:
        parts = f.readline().split()[1:]
    vals = list(map(int, parts))
    idle = vals[3] + vals[4]  # idle + iowait
    return sum(vals), idle


def _measure(fn):
    t_tot0, t_idle0 = _stat()
    t0 = time.perf_counter()
    own0 = time.process_time()
    fn()
    wall = time.perf_counter() - t0
    own = time.process_time() - own0
    t_tot1, t_idle1 = _stat()
    dt, di = t_tot1 - t_tot0, t_idle1 - t_idle0
    return {"wall_s": round(wall, 2),
            "own_cpu_frac": round(own / wall, 3),
            "system_busy_frac": round(1.0 - di / max(dt, 1), 3)}


def main() -> None:
    from cut_detection_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    from bench import _make_bench_clip
    from cut_detection_tpu.data.video import VideoFrameSource, batch_frames
    from cut_detection_tpu.models.assembly import load_default_net
    from cut_detection_tpu.pipeline import classify_video, segment_video_file

    out: dict = {"frames": FRAMES, "backend": jax.default_backend()}
    clip = _make_bench_clip(f"/tmp/cutdet_bench_{FRAMES}.mp4", FRAMES)
    net, _ = load_default_net(precision=PRECISION)
    classify_video(clip, net, frame_limit=256, print_every=0,
                   precision=PRECISION)  # warm jit

    # Decode ~16 batches to recycle for the transfer loop.
    batches = []
    src = VideoFrameSource(clip, resize=256)
    for b, _v in batch_frames(src, 128):
        batches.append(np.array(b))
        if len(batches) == 16:
            break
    src = None

    def transfer_pass():
        import itertools

        import jax.numpy as jnp

        nb = (FRAMES + 127) // 128
        it = itertools.islice(itertools.cycle(batches), nb)
        while True:
            chunk = list(itertools.islice(it, 8))
            if not chunk:
                break
            devs = [jax.device_put(b) for b in chunk]
            tot = jnp.int32(0)
            for d in devs:
                tot = tot + jnp.sum(d.reshape(-1)[:16].astype(jnp.int32))
            int(tot)

    def decode_pass():
        s = VideoFrameSource(clip, resize=256)
        for _b, _v in batch_frames(s, 128):
            pass

    def pipeline_pass():
        segment_video_file(clip, "/tmp/probe_cpu_out.csv", net=net,
                           print_every=0, precision=PRECISION)

    out["transfer"] = _measure(transfer_pass)
    out["decode"] = _measure(decode_pass)
    out["pipeline"] = _measure(pipeline_pass)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
