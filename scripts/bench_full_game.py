"""Measure a full 3h-game-scale single-chip run (VERDICT r4 #2).

The reference's whole product is one `segment_video.py` pass over a ~3h
broadcast (/root/reference/segment_video.py:20-77, ~324k frames @30fps);
the bench's sustained run covers only 30k frames, so the round-4 record
had no MEASURED seconds-per-game datum — only the assumption-laden v5e-8
projection.  This probe synthesizes a 324k-frame clip (the bench's
deterministic generator, cached in the tempdir), runs the production
pipeline once per configured (transfer, precision) mode with windowed
rates taken from the pipeline's own "Scored batch" log records, and
writes the record to docs/FULL_GAME.json for bench.py to embed in every
subsequent artifact.

Modes (FULL_GAME_MODES, comma-separated `transfer:precision` pairs):
  yuv420:uint8_chain   the production default on this hardware
                       (transfer=auto resolves to yuv420)
  bgr:uint8_chain      the byte-parity transfer at the same rung
  bgr:float32          the strict-parity mode (logits <1e-4 vs torch) —
                       running the torch reference itself over 324k
                       frames (~4.5h at its ~20 fps) is infeasible in a
                       round, so full-scale CSV agreement of the fast
                       rungs against THIS mode is the parity statement.

Usage (TPU, solo — nothing else may touch JAX):
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_full_game.py
Env: FULL_GAME_FRAMES (default 324000), FULL_GAME_MODES, FULL_GAME_OUT
(default docs/FULL_GAME.json), FULL_GAME_WORKERS (decode workers, 1).

Invocations are INCREMENTAL: each run merges its modes into an existing
OUT record (same frame count) and recomputes the parity flags from the
per-mode CSVs left in /tmp, so a long multi-mode measurement can be
split across runs and committed piecewise.
"""

from __future__ import annotations

import datetime
import json
import logging
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FRAMES = int(os.environ.get("FULL_GAME_FRAMES", 324000))
MODES = [m.split(":") for m in os.environ.get(
    "FULL_GAME_MODES",
    "yuv420:uint8_chain,bgr:uint8_chain,bgr:float32").split(",") if m]
OUT = os.environ.get("FULL_GAME_OUT",
                     os.path.join(REPO, "docs", "FULL_GAME.json"))
WORKERS = int(os.environ.get("FULL_GAME_WORKERS", 1))


class _BatchTimes(logging.Handler):
    """Collect (wall_time, batch_index) from 'Scored batch' log records."""

    def __init__(self):
        super().__init__()
        self.events: list[tuple[float, int]] = []

    def emit(self, record):
        msg = record.getMessage()
        if msg.startswith("Scored batch "):
            self.events.append((record.created, int(msg.split()[2])))


def _windows(events, batch_size, t_start, n_windows=14):
    """Per-window fps at ~frames/n_windows granularity."""
    if not events:
        return []
    total = events[-1][1] * batch_size
    win = max(1, total // n_windows)
    out = []
    prev_t, prev_f = t_start, 0
    for t, b in events:
        f = b * batch_size
        if f - prev_f >= win:
            out.append({"frames": f,
                        "fps": round((f - prev_f) / (t - prev_t), 1)})
            prev_t, prev_f = t, f
    return out


def _flat(windows) -> bool | None:
    """Flat = every post-ramp window within 15% of the window median."""
    if len(windows) < 3:
        return None
    rates = [w["fps"] for w in windows[1:]]  # drop the ramp window
    med = float(np.median(rates))
    return bool(min(rates) >= 0.85 * med)


def main() -> None:
    from cut_detection_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    from bench import _make_bench_clip
    from cut_detection_tpu.models.assembly import load_default_net
    from cut_detection_tpu.pipeline import resolve_transfer, segment_video_file

    logging.basicConfig(level=logging.INFO)
    print(f"[full-game] backend={jax.default_backend()} "
          f"frames={FRAMES}", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    clip = _make_bench_clip(
        os.path.join(os.environ.get("TMPDIR", "/tmp"),
                     f"cutdet_bench_{FRAMES}.mp4"), FRAMES)
    print(f"[full-game] clip ready in {time.perf_counter() - t0:.0f}s",
          file=sys.stderr, flush=True)

    nets: dict = {}
    runs: dict = {}
    csvs: dict = {}
    # Merge base: modes measured by a previous invocation at the same
    # frame count (their CSVs persist in /tmp for the parity flags).
    if os.path.isfile(OUT):
        with open(OUT) as f:
            prev = json.load(f)
        if prev.get("clip", {}).get("frames") == FRAMES:
            runs.update(prev.get("modes", {}))
            for key in runs:
                path = f"/tmp/full_game_{key}.csv"
                if os.path.isfile(path):
                    with open(path, "rb") as f:
                        csvs[key] = f.read()
    for transfer, precision in MODES:
        if precision not in nets:
            nets[precision], _ = load_default_net(precision=precision)
        net = nets[precision]
        out_csv = f"/tmp/full_game_{transfer}_{precision}.csv"
        handler = _BatchTimes()
        logging.getLogger("cut_detection_tpu.pipeline").addHandler(handler)
        t_start = time.perf_counter()
        t_wall0 = time.time()
        try:
            _, seg, stats = segment_video_file(
                clip, out_csv, net=net, precision=precision,
                print_every=20, decode_workers=WORKERS,
                transfer=transfer)
        finally:
            logging.getLogger("cut_detection_tpu.pipeline").removeHandler(
                handler)
        wall = time.perf_counter() - t_start
        windows = _windows(handler.events, 128, t_wall0)
        key = f"{transfer}_{precision}"
        runs[key] = {
            "transfer": transfer, "precision": precision,
            "frames": stats.frames, "e2e_s": round(wall, 1),
            "fps": round(stats.frames / wall, 1),
            "segments": len(seg),
            "decode_failures": stats.decode_failures,
            "windows": windows,
            "windows_flat": _flat(windows),
        }
        with open(out_csv, "rb") as f:
            csvs[key] = f.read()
        print(f"[full-game] {key}: {wall:.1f}s "
              f"({stats.frames / wall:.1f} fps), flat={_flat(windows)}",
              file=sys.stderr, flush=True)

    # Which mode is the production default on THIS hardware?
    prod_transfer = resolve_transfer("auto")
    prod_key = f"{prod_transfer}_uint8_chain"
    head = runs.get(prod_key) or next(iter(runs.values()))
    record = {
        "date": datetime.date.today().isoformat(),
        "hardware": "1 TPU v5e chip (axon relay), 1-core host",
        "command": "PYTHONPATH=/root/.axon_site:/root/repo python "
                   "scripts/bench_full_game.py",
        "clip": {"w": 640, "h": 360, "fps": 30, "frames": FRAMES,
                 "generator": "bench._make_bench_clip (deterministic)"},
        # Headline = the production-default mode's numbers.
        "transfer": head["transfer"],
        "precision": head["precision"],
        "frames": head["frames"],
        "e2e_s": head["e2e_s"],
        "fps": head["fps"],
        "windows_flat": head["windows_flat"],
        "seconds_per_3h_game_1chip": head["e2e_s"],
        "modes": runs,
    }
    if "bgr_uint8_chain" in csvs and "bgr_float32" in csvs:
        record["csv_parity_bgr"] = bool(
            csvs["bgr_uint8_chain"] == csvs["bgr_float32"])
        record["csv_parity_note"] = (
            "uint8_chain CSV byte-equal to the strict-parity float32 CSV "
            "over the full game (float32 is the mode with the proven "
            "<1e-4 logit bound vs the torch reference; running torch "
            "itself over 324k frames is a ~4.5h job)")
    if "yuv420_uint8_chain" in csvs and "bgr_uint8_chain" in csvs:
        record["csv_yuv_equals_bgr"] = bool(
            csvs["yuv420_uint8_chain"] == csvs["bgr_uint8_chain"])
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(record, f, indent=1)
        f.write("\n")
    print(json.dumps(record))


if __name__ == "__main__":
    main()
