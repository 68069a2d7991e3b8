"""Attribute the gap between pipeline e2e and its host-CPU floor
(VERDICT r4 #7).

Round 4 measured (yuv420, 10k frames): pure decode 13.7 s + transfer at
0.73 core-busy 10.4 s -> CPU-seconds floor ~21.3 s on the 1-core host,
but the pipeline ran 25.7 s — ~4.4 s above the physical floor.  This
probe isolates where that overhead lives, each phase with /proc/stat
core accounting:

  child_only     iterate ShmDecodeLoader and discard (subprocess decode
                 + ring writes + queue hops, no JAX at all)
  put_only       device_put + tiny fetch over REUSED host batches (the
                 relay transfer with zero decode anywhere)
  put_step       device_put + the real classify step per batch (adds
                 per-batch dispatch + device compute + final concat
                 fetch) over reused batches
  pipeline       the production classify_video (subprocess decode ring
                 + step + single concatenated fetch)

pipeline - max(child_only, put_step) - (contention term) is then
attributable; if put_step >> put_only the per-batch step dispatch is
the overhead, if child_only >> pure decode the ring copy is.

Usage (TPU, solo):
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_overlap_floor.py
Env: PROBE_FRAMES (default 10000), PROBE_TRANSFER (yuv420),
PROBE_PRECISION (uint8_chain).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FRAMES = int(os.environ.get("PROBE_FRAMES", 10000))
TRANSFER = os.environ.get("PROBE_TRANSFER", "yuv420")
PRECISION = os.environ.get("PROBE_PRECISION", "uint8_chain")


def _stat():
    with open("/proc/stat") as f:
        vals = list(map(int, f.readline().split()[1:]))
    return sum(vals), vals[3] + vals[4]


def timed(fn):
    t0, i0 = _stat()
    w0 = time.perf_counter()
    out = fn()
    wall = time.perf_counter() - w0
    t1, i1 = _stat()
    dt = max(t1 - t0, 1)
    return {"wall_s": round(wall, 2),
            "cpu_busy_frac": round(1.0 - (i1 - i0) / dt, 3)}, out


def main() -> None:
    from cut_detection_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from bench import _make_bench_clip, _e2e_stage_iter
    from cut_detection_tpu.data.shm_loader import ShmDecodeLoader
    from cut_detection_tpu.models.assembly import load_default_net
    from cut_detection_tpu.pipeline import classify_video, make_classify_step

    res: dict = {"frames": FRAMES, "transfer": TRANSFER,
                 "precision": PRECISION,
                 "backend": jax.default_backend(),
                 "cores": os.cpu_count()}
    clip = _make_bench_clip(f"/tmp/cutdet_bench_{FRAMES}.mp4", FRAMES)
    net, _ = load_default_net(precision=PRECISION)

    # Warm the jit (not billed to any phase).
    classify_video(clip, net, frame_limit=256, print_every=0,
                   precision=PRECISION, transfer=TRANSFER)

    # Phase: pure inline decode (the stage-pass quantity).
    def pure_decode():
        it, src = _e2e_stage_iter(clip, 1, TRANSFER)
        n = 0
        for _b, valid in it:
            n += valid
        if hasattr(src, "close"):
            src.close()
        return n

    res["pure_decode"], n = timed(pure_decode)
    res["pure_decode"]["fps"] = round(n / res["pure_decode"]["wall_s"], 1)

    # Phase: subprocess ring decode, parent discards (no JAX work).
    def child_only():
        src = ShmDecodeLoader(clip, batch_size=128, resize=256,
                              transfer=TRANSFER)
        n = 0
        for _b, valid in src:
            n += valid
        res["child_startup_s"] = round(src.startup_s or 0.0, 2)
        return n

    res["child_only"], n = timed(child_only)
    res["child_only"]["fps"] = round(n / res["child_only"]["wall_s"], 1)

    # Collect ~8 batches once for the reused-batch phases.
    it, src = _e2e_stage_iter(clip, 1, TRANSFER)
    import itertools

    batches = [b for b, _ in itertools.islice(it, 8)]
    if hasattr(src, "close"):
        src.close()
    n_batches = FRAMES // 128

    def put_only():
        for i in range(n_batches):
            d = jax.device_put(batches[i % len(batches)])
            int(jnp.sum(d.reshape(-1)[:16].astype(jnp.int32)))

    res["put_only"], _ = timed(put_only)
    res["put_only"]["fps"] = round(n_batches * 128
                                   / res["put_only"]["wall_s"], 1)

    # Per-batch step dispatch + device compute, reused host batches,
    # single concatenated fetch at the end (the pipeline's device side).
    if TRANSFER == "yuv420":
        h, w = 144, 256
        step = make_classify_step(net, yuv_dims=(h, w))
    else:
        step = make_classify_step(net)

    def put_step():
        confs, preds = [], []
        for i in range(n_batches):
            conf, pred = step(net.bundle, batches[i % len(batches)])
            confs.append(conf)
            preds.append(pred)
        np.asarray(jax.device_get(jnp.concatenate(confs)))
        np.asarray(jax.device_get(jnp.concatenate(preds)))

    res["put_step"], _ = timed(put_step)
    res["put_step"]["fps"] = round(n_batches * 128
                                   / res["put_step"]["wall_s"], 1)

    # The production pipeline.
    def pipeline():
        conf, _p, stats = classify_video(clip, net, print_every=0,
                                         precision=PRECISION,
                                         transfer=TRANSFER)
        return stats.frames

    res["pipeline"], n = timed(pipeline)
    res["pipeline"]["fps"] = round(n / res["pipeline"]["wall_s"], 1)

    # Attribution: floor = CPU-seconds sum over cores (both processes
    # contend for the same core); overhead = pipeline - floor.
    cores = os.cpu_count() or 1
    cpu_s = (res["child_only"]["cpu_busy_frac"] * res["child_only"]["wall_s"]
             + res["put_step"]["cpu_busy_frac"] * res["put_step"]["wall_s"])
    floor = max(res["child_only"]["wall_s"], res["put_step"]["wall_s"],
                cpu_s / cores)
    res["floor_s"] = round(floor, 2)
    res["overhead_above_floor_s"] = round(
        res["pipeline"]["wall_s"] - floor, 2)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
