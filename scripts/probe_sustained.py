"""Diagnose the sustained-run falloff (VERDICT r3 weak #2).

Round 3 measured 154 fps over 30k frames vs 243 fps median over
10k-frame repeats — a 37% degradation at 3x length, undiagnosed.  This
probe runs the CURRENT production pipeline (subprocess shm decode) on
the 30k clip and records windowed rates three ways, so the cause is
attributable to a stage instead of guessed:

  windows        per-batch wall-clock timestamps from the pipeline's own
                 "Scored batch" log records -> fps per 2.5k-frame window
  decode_windows pure decode pass over the same clip, windowed the same
                 way (does decode alone degrade with file position?)
  fetch_s        time of the final device_get collection (scales with
                 batch count; a superlinear term here would implicate
                 the relay's buffer table)

Usage (TPU, solo):
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_sustained.py
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FRAMES = int(os.environ.get("PROBE_FRAMES", 30000))
PRECISION = os.environ.get("PROBE_PRECISION", "uint8_chain")
WINDOW = 2500  # frames per reported window


class _BatchTimes(logging.Handler):
    """Collect (wall_time, batch_index) from pipeline 'Scored batch' logs."""

    def __init__(self):
        super().__init__()
        self.events: list[tuple[float, int]] = []

    def emit(self, record):
        msg = record.getMessage()
        if msg.startswith("Scored batch "):
            self.events.append((record.created,
                                int(msg.split()[2])))


def _windows(events, batch_size, t_start):
    """[(frames_done, fps_of_window), ...] at ~WINDOW-frame granularity."""
    out = []
    prev_t, prev_f = t_start, 0
    for t, b in events:
        f = b * batch_size
        if f - prev_f >= WINDOW:
            out.append({"frames": f,
                        "fps": round((f - prev_f) / (t - prev_t), 1)})
            prev_t, prev_f = t, f
    return out


def main() -> None:
    from cut_detection_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    from bench import _make_bench_clip
    from cut_detection_tpu.data.video import VideoFrameSource, batch_frames
    from cut_detection_tpu.models.assembly import load_default_net
    from cut_detection_tpu.pipeline import classify_video

    out: dict = {"frames": FRAMES, "precision": PRECISION,
                 "backend": jax.default_backend()}
    clip = _make_bench_clip(f"/tmp/cutdet_bench_{FRAMES}.mp4", FRAMES)
    net, _ = load_default_net(precision=PRECISION)

    # Warm the jitted step.
    classify_video(clip, net, frame_limit=256, print_every=0,
                   precision=PRECISION)

    handler = _BatchTimes()
    plog = logging.getLogger("cut_detection_tpu.pipeline")
    plog.addHandler(handler)
    plog.setLevel(logging.INFO)
    t0 = time.perf_counter()
    wall0 = time.time()
    conf, pred, stats = classify_video(
        clip, net, print_every=2, precision=PRECISION)
    out["pipeline_s"] = round(time.perf_counter() - t0, 1)
    out["pipeline_fps"] = round(stats.frames / (time.perf_counter() - t0), 1)
    plog.removeHandler(handler)
    out["windows"] = _windows(handler.events, 128, wall0)

    # The pipeline's own final-collect time is inside pipeline_s; isolate
    # an equivalent fetch pass: device_put + get of the same batch count
    # is not reproducible post-hoc, so instead report the LOG GAP between
    # the last Scored-batch record and classify_video returning.
    if handler.events:
        out["tail_after_last_batch_s"] = round(
            (wall0 + (time.perf_counter() - t0)) - handler.events[-1][0], 1)

    # Pure decode pass, windowed identically (no device touches).
    src = VideoFrameSource(clip, resize=256)
    t0 = time.perf_counter()
    events = []
    n = 0
    for i, (_b, valid) in enumerate(batch_frames(src, 128)):
        n += valid
        if (i + 1) % 2 == 0:
            events.append((time.time(), i + 1))
    out["decode_s"] = round(time.perf_counter() - t0, 1)
    out["decode_fps"] = round(n / out["decode_s"], 1)
    out["decode_windows"] = _windows(events, 128,
                                     time.time() - out["decode_s"])

    print(json.dumps(out))


if __name__ == "__main__":
    main()
