"""Benchmark: frames/sec/chip for the frame-classification hot path.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "frames/sec", "vs_baseline": R}

- ours: the shipped classify graph (uint8 NHWC batch -> CNN with the
  preprocess folded into conv1 for the bf16 perf modes -> per-frame
  max/argmax) on whatever accelerator JAX provides (the TPU chip under
  axon), measured as a device-resident loop at the optimal batch.
- baseline: the PyTorch reference prod net (frameID/net.py via
  /root/reference) on CPU, same 256x144 input contract, measured over a few
  batches.  The reference publishes no numbers (BASELINE.md), so the
  baseline is measured here, matching its eval path (segment_video.py:38-45).

Env knobs: BENCH_BATCH, BENCH_STEPS, BENCH_SECONDS, BENCH_PRECISION.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def bench_ours(batch: int, steps: int, min_seconds: float,
               precision: str | None = None) -> float:
    """Steady-state device throughput via an on-device fori_loop.

    The loop body perturbs the input with the iteration index (uint8 add)
    so XLA cannot hoist or dedupe iterations, and accumulates a scalar so
    every iteration is live — this measures true execution rate, immune to
    async-dispatch artifacts through the remote relay.
    """
    from cut_detection_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from cut_detection_tpu.models.assembly import _glued_apply, load_default_net
    from cut_detection_tpu.ops.preprocess import normalize_frames

    if precision is None:
        precision = os.environ.get("BENCH_PRECISION", "uint8_pool")
    net, _ = load_default_net(precision=precision)
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, size=(batch, 144, 256, 3), dtype=np.uint8)
    frames = jax.device_put(frames)

    # Match the pipeline's shipped graph: every mode folds the flip+/255
    # preprocess into conv1's weights (assembly.fold_preprocess).
    fold = True
    from cut_detection_tpu.models.assembly import fold_preprocess

    bundle0 = jax.tree_util.tree_map(jnp.asarray,
                                     fold_preprocess(net.bundle))

    @jax.jit
    def run(bundle, frames_u8, k):
        def body(i, acc):
            # Iteration-dependent input so XLA can't hoist or dedupe.
            x = frames_u8 + i.astype(jnp.uint8)
            xx = x.astype(jnp.float32) if fold else normalize_frames(x)
            logits = _glued_apply(bundle, xx,
                                  conv_cfg=net.conv_cfg,
                                  linear_cfg=net.linear_cfg,
                                  compute_dtype=net.compute_dtype)
            return acc + jnp.sum(logits)
        return jax.lax.fori_loop(0, k, body, jnp.float32(0))

    # Warmup / compile.  NOTE: fetch the value — through the axon relay,
    # block_until_ready alone does not guarantee execution finished.
    float(run(bundle0, frames, 1))

    n = 0
    t0 = time.perf_counter()
    while True:
        float(run(bundle0, frames, steps))
        n += steps * batch
        if time.perf_counter() - t0 >= min_seconds:
            break
    dt = time.perf_counter() - t0
    return n / dt


def bench_reference(batch: int, seconds: float) -> float | None:
    """Torch reference net on CPU (its own fallback device; segment_video.py:25).

    Warmup uses FULL-size batches: the first full-batch forward pays
    one-time allocator/page-fault costs that depressed early measurements
    (7.8 fps cold vs ~21 fps warm on this 1-core host — the discrepancy
    VERDICT r1 flagged).  The warm steady state is the honest baseline;
    note the shared host still drifts ~2x run to run (docs/PERFORMANCE.md).
    """
    if not os.path.isdir("/root/reference"):
        return None
    sys.path.insert(0, "/root/reference")
    try:
        import torch

        from frameID.net import load_default_net as torch_load

        tnet, _ = torch_load()
        tnet.eval()
        rng = np.random.default_rng(0)
        x = torch.from_numpy(
            rng.random((batch, 3, 144, 256), dtype=np.float32)
        )
        with torch.no_grad():
            for _ in range(3):  # full-size warmup (see docstring)
                tnet(x)
            n = 0
            t0 = time.perf_counter()
            while time.perf_counter() - t0 < seconds:
                tnet(x)
                n += batch
        return n / (time.perf_counter() - t0)
    except Exception:
        return None


def _make_bench_clip(path: str, frames: int, w: int = 640,
                     h: int = 360) -> str:
    """Synthesize (once) a deterministic mp4 clip for the e2e measurement."""
    if os.path.isfile(path):
        return path
    import cv2

    wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30, (w, h))
    rng = np.random.default_rng(7)
    colors = [(40, 120, 40), (10, 10, 10), (150, 60, 60), (60, 60, 140)]
    left = frames
    i = 0
    while left > 0:
        n = min(left, int(rng.integers(60, 400)))
        base = np.full((h, w, 3), colors[i % len(colors)], np.uint8)
        for _ in range(n):
            wr.write(cv2.add(base,
                             rng.integers(0, 30, (h, w, 3), dtype=np.uint8)))
        left -= n
        i += 1
    wr.release()
    return path


def bench_e2e(precision: str, frames: int, decode_workers: int) -> dict:
    """End-to-end decode -> transfer -> classify -> smooth -> CSV.

    Returns the full-pipeline fps plus a per-stage breakdown, so the e2e
    number is an artifact, not prose (VERDICT r1 item 3):

    - ``decode_fps``: host decode+resize only (the usual bottleneck on a
      real TPU VM).
    - ``transfer_fps``: host->device upload of the decoded uint8 batches
      (through the axon relay this is the dominant stage; on PCIe it is
      ~3 orders faster).
    - ``classify_fps``: chip-resident loop (the headline measurement).
    - ``smooth_ms`` / ``csv_ms``: host post-process on the real outputs.
    - ``e2e_fps``: wall clock of ``segment_video_file`` over the clip.
    - ``overlap``: e2e time vs the serial stage sum and the max-stage
      bound — 1.0 means async dispatch fully hides the faster stages
      behind the slowest one.
    """
    import tempfile

    import jax
    import jax.numpy as jnp

    from cut_detection_tpu.data.video import ParallelVideoReader, batch_frames
    from cut_detection_tpu.pipeline import (
        classify_video,
        segment_video_file,
    )
    from cut_detection_tpu.segmentation.rle import Segmentation

    clip = _make_bench_clip(
        os.path.join(tempfile.gettempdir(), f"cutdet_bench_{frames}.mp4"),
        frames)

    # Stage: decode only (collect the batches for the transfer stage).
    src = ParallelVideoReader(clip, resize=256, num_threads=decode_workers)
    t0 = time.perf_counter()
    batches = [b for b, _ in batch_frames(src, 128)]
    decode_s = time.perf_counter() - t0
    n_dec = src.length - src.frames_failed

    # Stage: host->device transfer of those uint8 batches.  A tiny
    # on-device reduction chained across all uploads is fetched once at
    # the end: through the axon relay block_until_ready returns early,
    # so only a value fetch proves every transfer completed.
    t0 = time.perf_counter()
    devs = [jax.device_put(b) for b in batches]
    total = jnp.int32(0)
    for d in devs:
        total = total + jnp.sum(d[0, 0, :].astype(jnp.int32))
    int(total)
    transfer_s = time.perf_counter() - t0
    del devs

    # Full pipeline (includes one warm classify pass first so jit compile
    # is not billed to the e2e number; the compilation cache makes the
    # warm pass cheap on reruns).
    out_csv = os.path.join(tempfile.gettempdir(), "cutdet_bench_out.csv")
    conf, pred, _ = classify_video(clip, frame_limit=256, print_every=0,
                                   precision=precision,
                                   decode_workers=decode_workers)
    t0 = time.perf_counter()
    _, seg, stats = segment_video_file(clip, out_csv, print_every=0,
                                       precision=precision,
                                       decode_workers=decode_workers)
    e2e_s = time.perf_counter() - t0

    # Stage: smooth + csv on the full-length outputs.
    conf_f, pred_f, _ = classify_video(clip, print_every=0,
                                       precision=precision,
                                       decode_workers=decode_workers)
    t0 = time.perf_counter()
    seg2 = Segmentation.from_frame_scores(conf_f, pred_f)
    seg2.glue_orphans(100, 10)
    seg2.combine_adjacent_segments()
    smooth_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    seg2.write_csv(out_csv)
    csv_s = time.perf_counter() - t0

    classify_fps = bench_ours(128, 64, 3.0, precision=precision)
    classify_s = n_dec / classify_fps if classify_fps else float("inf")
    serial_s = decode_s + transfer_s + classify_s + smooth_s + csv_s
    bound_s = max(decode_s, transfer_s, classify_s, smooth_s + csv_s)
    return {
        "frames": n_dec,
        "e2e_fps": round(n_dec / e2e_s, 1),
        "decode_fps": round(n_dec / decode_s, 1),
        "transfer_fps": round(n_dec / transfer_s, 1),
        "classify_fps": round(classify_fps, 1),
        "smooth_ms": round(smooth_s * 1e3, 2),
        "csv_ms": round(csv_s * 1e3, 2),
        "overlap": {
            "e2e_s": round(e2e_s, 3),
            "serial_sum_s": round(serial_s, 3),
            "max_stage_s": round(bound_s, 3),
            # 1.0 = perfect overlap (e2e == max stage); 0.0 = fully serial.
            "efficiency": round((serial_s - e2e_s)
                                / max(serial_s - bound_s, 1e-9), 3),
        },
    }


def main() -> None:
    # Batch 128 measured fastest on the v5e (70.6k vs 60.6k at 256 — see
    # docs/PERFORMANCE.md) and matches the CLI's default batch size.
    batch = int(os.environ.get("BENCH_BATCH", 128))
    # Enough device-resident iterations per call that the host round-trip
    # is amortized below the noise floor.
    steps = int(os.environ.get("BENCH_STEPS", 512))
    seconds = float(os.environ.get("BENCH_SECONDS", 10))
    # uint8_pool is the fastest rung (uint8 pooled-activation storage,
    # accuracy-gated by the eval corpus; byte-identical CSV on the golden
    # clip).  BENCH_PRECISION=bfloat16_full measures the fastest
    # byte-parity-verified-everywhere mode, float32 the strict-parity mode.
    precision = os.environ.get("BENCH_PRECISION", "uint8_pool")

    ours = bench_ours(batch, steps, seconds)
    ref = bench_reference(min(batch, 128), min(seconds, 8.0))

    result = {
        "metric": ("frames/sec/chip, 256x144 uint8 -> classify "
                   f"(prod net, {precision})"),
        "value": round(ours, 1),
        "unit": "frames/sec",
        "vs_baseline": round(ours / ref, 2) if ref else None,
    }
    # End-to-end decode->transfer->classify->smooth->CSV measurement on a
    # synthetic clip, as an artifact of every bench run (BENCH_E2E=0 to
    # skip; BENCH_E2E_FRAMES sizes the clip).
    if os.environ.get("BENCH_E2E", "1") != "0":
        try:
            result["e2e"] = bench_e2e(
                precision,
                frames=int(os.environ.get("BENCH_E2E_FRAMES", 3000)),
                decode_workers=int(os.environ.get("BENCH_E2E_WORKERS", 4)))
        except Exception as e:  # never break the headline line
            result["e2e"] = {"error": f"{type(e).__name__}: {e}"}
    print(json.dumps(result))


if __name__ == "__main__":
    main()
