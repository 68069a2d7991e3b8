"""Same-window chip measurement: int8_mxu vs uint8_chain vs uint8_pool.

The `int8_mxu` rung (integer convs end to end, models/layers.py
apply_conv_block_i8) was implemented and accuracy-gated in round 3 but its
chip throughput is pending (docs/PERFORMANCE.md) — the tunnel was down when
it landed.  The question it answers: does XLA:TPU emit true int8 MXU convs
(escaping the materialized uint8->bf16 operand conversion that caps
uint8_chain at ~122k fps), or does it silently upcast?

Methodology matches bench.py's bench_ours exactly (device-resident
fori_loop, iteration-perturbed input, scalar accumulator, value fetch for
relay-safe sync), with all rungs interleaved per repeat so host drift hits
every rung equally.  Reference measurement contract:
/root/reference/segment_video.py:38-45 (the batch-forward hot loop).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_int8_rung.py
"""

from __future__ import annotations

import json
import time

import numpy as np

from cut_detection_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from cut_detection_tpu.models.assembly import (
    _glued_apply,
    fold_preprocess,
    folded_input,
    load_default_net,
)

B, H, W = 128, 144, 256
STEPS = 64
RUNGS = ("uint8_pool", "uint8_chain", "int8_mxu")


def make_run(precision: str):
    net, _ = load_default_net(precision=precision)
    bundle = jax.tree_util.tree_map(jnp.asarray, fold_preprocess(net.bundle))

    @jax.jit
    def run(bundle, frames_u8, k):
        def body(i, acc):
            x = frames_u8 + i.astype(jnp.uint8)
            xx = folded_input(x, net.compute_dtype)
            logits = _glued_apply(bundle, xx, conv_cfg=net.conv_cfg,
                                  linear_cfg=net.linear_cfg,
                                  compute_dtype=net.compute_dtype)
            return acc + jnp.sum(logits)
        return jax.lax.fori_loop(0, k, body, jnp.float32(0))

    return bundle, run


def main():
    rng = np.random.default_rng(0)
    frames = jax.device_put(
        rng.integers(0, 256, (B, H, W, 3), dtype=np.uint8))

    runs = {}
    for p in RUNGS:
        t0 = time.perf_counter()
        bundle, run = make_run(p)
        float(run(bundle, frames, 2))  # compile + warm
        print(f"[probe] {p}: compiled+warm in "
              f"{time.perf_counter() - t0:.1f}s", flush=True)
        runs[p] = (bundle, run)

    reps = {p: [] for p in RUNGS}
    for r in range(5):
        for p in RUNGS:  # interleaved: drift hits all rungs equally
            bundle, run = runs[p]
            t0 = time.perf_counter()
            float(run(bundle, frames, STEPS))
            dt = time.perf_counter() - t0
            reps[p].append(STEPS * B / dt)
        print(f"[probe] repeat {r}: " +
              "  ".join(f"{p}={reps[p][-1]:,.0f}" for p in RUNGS),
              flush=True)

    out = {p: {"median_fps": sorted(v)[len(v) // 2],
               "all_fps": [round(x, 1) for x in v]}
           for p, v in reps.items()}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
