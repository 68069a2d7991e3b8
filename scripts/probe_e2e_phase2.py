"""Phase 2: CPU-time vs wall-time per e2e phase + pipeline A/B.

Determines whether the host->device transfer is CPU-bound (no overlap
possible on this 1-core host) or network-bound (CPU idle during sends —
overlap with decode is possible and the pipeline should achieve it).
Also A/B's classify_video with prefetch on vs off, interleaved to
control for host drift.

Usage (TPU):
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_e2e_phase2.py
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn):
    w0, c0 = time.perf_counter(), time.process_time()
    out = fn()
    return out, time.perf_counter() - w0, time.process_time() - c0


def main() -> None:
    from cut_detection_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from bench import _make_bench_clip
    from cut_detection_tpu.data.video import ParallelVideoReader, batch_frames
    from cut_detection_tpu.models.assembly import load_default_net
    from cut_detection_tpu.pipeline import classify_video, make_classify_step

    frames = int(os.environ.get("PROBE_FRAMES", 5000))
    precision = os.environ.get("PROBE_PRECISION", "uint8_chain")
    out: dict = {"frames": frames}
    clip = _make_bench_clip(f"/tmp/cutdet_bench_{frames}.mp4", frames)

    net, _ = load_default_net(precision=precision)
    step = make_classify_step(net)

    def decode_all():
        src = ParallelVideoReader(clip, resize=256, num_threads=4)
        return [b for b, _ in batch_frames(src, 128)]

    # Warm everything (incl. jit) once.
    batches, _, _ = timed(decode_all)
    c, p = step(net.bundle, batches[0])
    float(jnp.sum(c)), int(jnp.sum(p))
    nbytes = sum(b.nbytes for b in batches)

    def put_all():
        devs = [jax.device_put(b) for b in batches]
        tot = jnp.int32(0)
        for d in devs:
            tot = tot + d[0, 0, 0, 0].astype(jnp.int32)
        return int(tot)

    def step_all():
        outs = [step(net.bundle, b) for b in batches]
        return [np.asarray(jax.device_get(p)) for _, p in outs]

    def pipeline(prefetch):
        return classify_video(clip, net, print_every=0, decode_workers=4,
                              precision=precision,
                              prefetch_batches=prefetch)

    # Hand-rolled decode||put overlap: decode on a thread, puts on main.
    def overlap_decode_put():
        got = []

        def dec():
            got.extend(decode_all())

        t = threading.Thread(target=dec)
        t.start()
        devs = [jax.device_put(b) for b in batches]  # previous decode's
        tot = jnp.int32(0)
        for d in devs:
            tot = tot + d[0, 0, 0, 0].astype(jnp.int32)
        int(tot)
        t.join()
        return len(got)

    report = []
    for rep in range(2):
        for name, fn in (
            ("decode", decode_all),
            ("put", put_all),
            ("step", step_all),
            ("pipe_pf2", lambda: pipeline(2)),
            ("pipe_pf0", lambda: pipeline(0)),
            ("overlap_dec_put", overlap_decode_put),
        ):
            _, wall, cpu = timed(fn)
            row = {"rep": rep, "phase": name, "wall_s": round(wall, 2),
                   "cpu_s": round(cpu, 2),
                   "cpu_frac": round(cpu / wall, 2),
                   "fps": round(frames / wall, 1)}
            report.append(row)
            print(f"[p2] {row}", file=sys.stderr, flush=True)

    out["MB"] = round(nbytes / 1e6, 1)
    out["rows"] = report
    print(json.dumps(out))


if __name__ == "__main__":
    main()
