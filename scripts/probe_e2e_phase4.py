"""Phase 4: SYSTEM-wide CPU accounting of the relay transfer.

Phase 3 showed a decode subprocess overlaps the put loop only partially
(27.1 s serial -> ~21 s).  Hypothesis: the tunnel transfer costs real
host CPU that process_time() of the parent never sees — kernel TCP/
softirq time plus any relay proxy process.  Sample /proc/stat around
each phase to get machine-wide busy time.

Usage (TPU):
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_e2e_phase4.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def cpu_totals():
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(v) for v in parts[1:]]
    idle = vals[3] + vals[4]  # idle + iowait
    return sum(vals), idle


def sys_timed(fn):
    t0, (tot0, idle0) = time.perf_counter(), cpu_totals()
    fn()
    wall = time.perf_counter() - t0
    tot1, idle1 = cpu_totals()
    busy = (tot1 - tot0) - (idle1 - idle0)
    hz = os.sysconf("SC_CLK_TCK")
    return wall, busy / hz


def main() -> None:
    from cut_detection_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from bench import _make_bench_clip
    from cut_detection_tpu.data.video import ParallelVideoReader, batch_frames

    frames = int(os.environ.get("PROBE_FRAMES", 3000))
    out: dict = {"frames": frames, "ncpu": os.cpu_count()}
    clip = _make_bench_clip(f"/tmp/cutdet_bench_{frames}.mp4", frames)

    src = ParallelVideoReader(clip, resize=256, num_threads=4)
    batches = [b for b, _ in batch_frames(src, 128)]
    int(jnp.int32(1) + 1)  # warm backend

    def put_all():
        devs = [jax.device_put(b) for b in batches]
        tot = jnp.int32(0)
        for d in devs:
            tot = tot + d[0, 0, 0, 0].astype(jnp.int32)
        int(tot)

    def decode_all():
        s = ParallelVideoReader(clip, resize=256, num_threads=4)
        for _ in batch_frames(s, 128):
            pass

    def idle():
        time.sleep(5)

    for name, fn in (("idle5s", idle), ("decode", decode_all),
                     ("put", put_all), ("put2", put_all)):
        wall, busy = sys_timed(fn)
        out[name] = {"wall_s": round(wall, 2), "sys_busy_cpu_s": round(busy, 2),
                     "busy_frac": round(busy / wall, 2)}
        print(f"[p4] {name}: {out[name]}", file=sys.stderr, flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
