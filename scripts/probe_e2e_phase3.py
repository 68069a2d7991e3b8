"""Phase 3: does a decode SUBPROCESS overlap the relay transfer?

Phase 2 showed the axon relay's device_put blocks with the GIL held
(cpu_frac ~0.08 yet a decode THREAD gets no cycles), so in-process
prefetch can't overlap decode with transfer.  A subprocess is immune to
the parent's GIL: the OS schedules it during the parent's socket waits.
This probe runs the put-loop in the parent while a child process
decodes the same clip, and compares against the serial sum.

Usage (TPU):
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_e2e_phase3.py
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _decode_child(clip: str, out_q) -> None:
    # No jax in the child; decode + batch only.
    from cut_detection_tpu.data.video import ParallelVideoReader, batch_frames

    src = ParallelVideoReader(clip, resize=256, num_threads=4)
    n = 0
    for b, valid in batch_frames(src, 128):
        n += valid
    out_q.put(n)


def main() -> None:
    from cut_detection_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from bench import _make_bench_clip
    from cut_detection_tpu.data.video import ParallelVideoReader, batch_frames

    frames = int(os.environ.get("PROBE_FRAMES", 5000))
    out: dict = {"frames": frames}
    clip = _make_bench_clip(f"/tmp/cutdet_bench_{frames}.mp4", frames)

    # Decode once in-process (also warms the page cache).
    t0 = time.perf_counter()
    src = ParallelVideoReader(clip, resize=256, num_threads=4)
    batches = [b for b, _ in batch_frames(src, 128)]
    out["decode_s"] = round(time.perf_counter() - t0, 2)

    def put_all():
        devs = [jax.device_put(b) for b in batches]
        tot = jnp.int32(0)
        for d in devs:
            tot = tot + d[0, 0, 0, 0].astype(jnp.int32)
        return int(tot)

    # Warm the backend.
    int(jnp.int32(1) + 1)

    t0 = time.perf_counter()
    put_all()
    out["put_s"] = round(time.perf_counter() - t0, 2)

    ctx = mp.get_context("spawn")
    for rep in range(2):
        q = ctx.Queue()
        child = ctx.Process(target=_decode_child, args=(clip, q))
        t0 = time.perf_counter()
        child.start()
        put_all()
        put_wall = time.perf_counter() - t0
        n = q.get(timeout=600)
        child.join(timeout=60)
        wall = time.perf_counter() - t0
        out[f"overlap_proc_rep{rep}"] = {
            "wall_s": round(wall, 2), "put_wall_s": round(put_wall, 2),
            "child_frames": n, "fps": round(frames / wall, 1)}
        print(f"[p3] rep{rep}: {out[f'overlap_proc_rep{rep}']}",
              file=sys.stderr, flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
