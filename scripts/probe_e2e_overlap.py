"""Decompose the e2e pipeline's per-batch device costs on the real chip.

Round-3 verdict: all three BENCH_r03 e2e repeats show the production
pipeline SLOWER than its stages run serially (41.2 s vs 29.7 s on 10k
frames) — ~11 s of unexplained per-run overhead.  This probe separates
the candidate costs, each as the same batch stream through a different
submission pattern:

  decode   — host decode to RAM (the input all cases share)
  put      — per-batch jax.device_put, one tiny fetch at the end
  step     — pipeline's per-batch jitted step on host arrays (implicit
             transfer), outputs collected at the end (current pipeline)
  step_pre — same but with an explicit device_put before each call
             (separates transfer RPC from execute RPC)
  step_sync— step with a per-batch value fetch (full round trip per call)
  super4/8 — 4/8 batches concatenated into ONE call (fewer, larger RPCs)
  collect  — the final device_get of all per-batch outputs, alone

Usage (TPU):
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_e2e_overlap.py
Env: PROBE_FRAMES (default 5000), PROBE_PRECISION (default uint8_chain).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from cut_detection_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from bench import _make_bench_clip
    from cut_detection_tpu.data.video import ParallelVideoReader, batch_frames
    from cut_detection_tpu.models.assembly import load_default_net
    from cut_detection_tpu.pipeline import make_classify_step

    frames = int(os.environ.get("PROBE_FRAMES", 5000))
    precision = os.environ.get("PROBE_PRECISION", "uint8_chain")
    out: dict = {"frames": frames, "precision": precision,
                 "platform": jax.devices()[0].platform}

    clip = _make_bench_clip(f"/tmp/cutdet_bench_{frames}.mp4", frames)

    t0 = time.perf_counter()
    src = ParallelVideoReader(clip, resize=256, num_threads=4)
    batches = [b for b, _ in batch_frames(src, 128)]
    out["decode_s"] = round(time.perf_counter() - t0, 3)
    out["batches"] = len(batches)
    nbytes = sum(b.nbytes for b in batches)
    out["MB"] = round(nbytes / 1e6, 1)

    net, _ = load_default_net(precision=precision)
    step = make_classify_step(net)

    # Warmup/compile at both shapes; fetch values (relay lies on
    # block_until_ready).
    c, p = step(net.bundle, batches[0])
    float(jnp.sum(c)), int(jnp.sum(p))
    sup8 = np.concatenate(batches[:8])
    c, p = step(net.bundle, sup8)
    float(jnp.sum(c)), int(jnp.sum(p))
    sup4 = np.concatenate(batches[:4])
    c, p = step(net.bundle, sup4)
    float(jnp.sum(c)), int(jnp.sum(p))

    def report(name, secs):
        out[name] = {"s": round(secs, 3),
                     "fps": round(frames / secs, 1),
                     "MBps": round(nbytes / 1e6 / secs, 1)}
        print(f"[probe] {name}: {out[name]}", file=sys.stderr, flush=True)

    # put: per-batch device_put, one forcing fetch at the end.
    t0 = time.perf_counter()
    devs = [jax.device_put(b) for b in batches]
    tot = jnp.int32(0)
    for d in devs:
        tot = tot + d[0, 0, 0, 0].astype(jnp.int32)
    int(tot)
    report("put", time.perf_counter() - t0)
    del devs

    # step: the current pipeline inner loop (host arrays in, collect at
    # the end via device_get).
    t0 = time.perf_counter()
    outs = [step(net.bundle, b) for b in batches]
    confs = np.concatenate([np.asarray(jax.device_get(c)) for c, _ in outs])
    preds = np.concatenate([np.asarray(jax.device_get(p)) for _, p in outs])
    report("step", time.perf_counter() - t0)
    ref_pred = preds.copy()

    # collect alone (outputs already computed above are gone; redo cheap)
    outs = [step(net.bundle, b) for b in batches]
    float(jnp.sum(outs[-1][0]))  # ensure all executed
    t0 = time.perf_counter()
    _ = [np.asarray(jax.device_get(c)) for c, _ in outs]
    _ = [np.asarray(jax.device_get(p)) for _, p in outs]
    report("collect", time.perf_counter() - t0)
    del outs

    # step_pre: explicit device_put then call.
    t0 = time.perf_counter()
    outs = []
    for b in batches:
        d = jax.device_put(b)
        outs.append(step(net.bundle, d))
    confs2 = np.concatenate([np.asarray(jax.device_get(c)) for c, _ in outs])
    report("step_pre", time.perf_counter() - t0)
    del outs

    # step_sync: fetch per batch (full round trip each call).
    t0 = time.perf_counter()
    preds_sync = []
    for b in batches:
        c, p = step(net.bundle, b)
        preds_sync.append(np.asarray(jax.device_get(p)))
    report("step_sync", time.perf_counter() - t0)

    # super4 / super8: fewer, larger calls.
    for k in (4, 8):
        t0 = time.perf_counter()
        outs = []
        for i in range(0, len(batches), k):
            grp = batches[i:i + k]
            if len(grp) < k:
                pad = np.zeros((k * 128 - sum(len(g) for g in grp),)
                               + grp[0].shape[1:], grp[0].dtype)
                grp = grp + [pad]
            outs.append(step(net.bundle, np.concatenate(grp)))
        preds_k = np.concatenate(
            [np.asarray(jax.device_get(p)) for _, p in outs])[:frames]
        report(f"super{k}", time.perf_counter() - t0)
        out[f"super{k}_match"] = bool(
            np.array_equal(preds_k, ref_pred[:frames]))

    print(json.dumps(out))


if __name__ == "__main__":
    main()
