"""Quick pipeline-only timing: BGR vs YUV420 after the round-4 tweaks.

Measures segment_video_file wall time on the 10k bench clip in both
transfer modes (1 decode worker — measured fastest on this host), plus
the shm child's startup latency, so each optimization's effect is
attributable.  Assumes jitted steps may be cold: does a short warm pass
per mode first (billed separately).

Usage (TPU, solo):
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_pipeline_quick.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FRAMES = int(os.environ.get("PROBE_FRAMES", 10000))
PRECISION = os.environ.get("PROBE_PRECISION", "uint8_chain")


def main() -> None:
    from cut_detection_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    from bench import _make_bench_clip
    from cut_detection_tpu import pipeline as pl
    from cut_detection_tpu.models.assembly import load_default_net

    out: dict = {"frames": FRAMES, "precision": PRECISION,
                 "backend": jax.default_backend()}
    clip = _make_bench_clip(f"/tmp/cutdet_bench_{FRAMES}.mp4", FRAMES)
    net, _ = load_default_net(precision=PRECISION)

    # Capture the shm loader's startup latency per run (classify_video
    # re-imports the class attribute per call, so patching sticks).
    startups = []
    import cut_detection_tpu.data.shm_loader as shm

    class Instrumented(shm.ShmDecodeLoader):
        def close(self):
            if self.startup_s is not None:
                startups.append(round(self.startup_s, 2))
                self.startup_s = None  # record once per loader
            super().close()

    shm.ShmDecodeLoader = Instrumented

    for mode in ("bgr", "yuv420"):
        t0 = time.perf_counter()
        pl.classify_video(clip, net, frame_limit=256, print_every=0,
                          precision=PRECISION, transfer=mode)
        out[f"warm_{mode}_s"] = round(time.perf_counter() - t0, 1)
        t0 = time.perf_counter()
        pl.segment_video_file(clip, f"/tmp/probe_quick_{mode}.csv", net=net,
                              print_every=0, precision=PRECISION,
                              transfer=mode)
        out[f"pipeline_{mode}_s"] = round(time.perf_counter() - t0, 2)
        out[f"pipeline_{mode}_fps"] = round(
            FRAMES / out[f"pipeline_{mode}_s"], 1)
    out["shm_startup_s"] = startups
    print(json.dumps(out))


if __name__ == "__main__":
    main()
