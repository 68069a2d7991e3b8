"""TPU train-step throughput: f32 vs bfloat16 mixed precision.

Prod supervised config (3x48ch conv, batch 128 at 144x256).  Steps are
dispatched back-to-back and the final metric fetched (the axon relay
returns early from block_until_ready, so only a value fetch times real
execution).

Usage: python scripts/bench_train.py [batch] [steps]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

from cut_detection_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax

from cut_detection_tpu.config import TrainConfig
from cut_detection_tpu.train.supervised import (
    init_train_state,
    make_train_step,
)


def main() -> None:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 30

    rng = np.random.default_rng(0)
    x = jax.device_put(
        rng.integers(0, 255, size=(batch, 144, 256, 3), dtype=np.uint8))
    y = jax.device_put(rng.integers(0, 3, size=(batch,)).astype(np.int32))

    out = {"batch": batch, "steps": steps}
    for label, cd in [("f32", None), ("bf16", "bfloat16")]:
        cfg = TrainConfig(batch_size=batch, compute_dtype=cd)
        step, _ = make_train_step(cfg)
        step = jax.jit(step, donate_argnums=(0,))
        state = init_train_state(jax.random.PRNGKey(0), cfg)
        state, m = step(state, x, y)
        float(m["loss"])  # compile + warm
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(steps):
                state, m = step(state, x, y)
            float(m["loss"])  # fetch = sync
            reps.append((time.perf_counter() - t0) / steps)
        sec = sorted(reps)[1]
        out[label + "_step_ms"] = round(1e3 * sec, 2)
        out[label + "_frames_per_sec"] = round(batch / sec, 1)
        out[label + "_final_loss"] = round(float(m["loss"]), 3)
    out["speedup"] = round(out["f32_step_ms"] / out["bf16_step_ms"], 2)

    # SimCLR step (reference config: batch 32, 32ch conv, on-device
    # augmented 144x256 views from 360p originals).
    from cut_detection_tpu.config import ContrastiveConfig
    from cut_detection_tpu.train.contrastive import (
        init_contrastive_state,
        make_contrastive_step,
    )

    xc = jax.device_put(
        rng.integers(0, 255, size=(32, 360, 640, 3), dtype=np.uint8))
    key = jax.random.PRNGKey(0)
    for label, cd, fa in [("simclr_f32", None, False),
                          ("simclr_bf16", "bfloat16", False),
                          ("simclr_fast", None, True),
                          ("simclr_fast_bf16", "bfloat16", True)]:
        ccfg = ContrastiveConfig(batch_size=32, compute_dtype=cd,
                                 fast_augment=fa)
        cstep, _ = make_contrastive_step(ccfg)
        cstep = jax.jit(cstep, donate_argnums=(0,))
        cstate = init_contrastive_state(jax.random.PRNGKey(0), ccfg)
        cstate, m = cstep(cstate, key, xc)
        float(m["loss"])
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(steps):
                cstate, m = cstep(cstate, key, xc)
            float(m["loss"])
            reps.append((time.perf_counter() - t0) / steps)
        out[label + "_step_ms"] = round(1e3 * sorted(reps)[1], 2)
    out["simclr_bf16_speedup"] = round(
        out["simclr_f32_step_ms"] / out["simclr_bf16_step_ms"], 2)
    out["simclr_fast_speedup"] = round(
        out["simclr_f32_step_ms"] / out["simclr_fast_step_ms"], 2)
    out["simclr_fast_bf16_speedup"] = round(
        out["simclr_f32_step_ms"] / out["simclr_fast_bf16_step_ms"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
