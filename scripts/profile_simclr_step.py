"""Where does the SimCLR step's time go?  (augment vs train math)

Times, on the chip, at the reference config (batch 32, 360p originals):
  augment      — simclr_two_views alone (the on-device torchvision
                 pipeline: full-res affine gather + color jitter + RRC)
  affine_only  — just the random_affine stage at full res
  jitter_only  — just color_jitter at full res
  rrc_only     — just random_resized_crop (full res -> 144x256)
  train_math   — forward+backward+optimizer on precomputed views

Usage: python scripts/profile_simclr_step.py [batch] [steps]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

from cut_detection_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from cut_detection_tpu.config import ContrastiveConfig
from cut_detection_tpu.train.augment import (
    color_jitter,
    random_affine,
    random_resized_crop,
    simclr_two_views,
)
from cut_detection_tpu.train.contrastive import (
    init_contrastive_state,
    make_contrastive_step,
)


def timed(fn, *args, steps):
    jax.block_until_ready(fn(*args))
    r = np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])  # fetch=sync
    del r
    assert steps > 0, "steps must be positive"
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        reps.append((time.perf_counter() - t0) / steps)
    return sorted(reps)[1]


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    rng = np.random.default_rng(0)
    x = jax.device_put(
        rng.integers(0, 255, size=(batch, 360, 640, 3), dtype=np.uint8))
    xf = jnp.asarray(x).astype(jnp.float32) / 255.0
    key = jax.random.PRNGKey(0)

    out = {"batch": batch}
    out["augment_ms"] = round(1e3 * timed(
        jax.jit(lambda k, v: simclr_two_views(k, v)), key, x, steps=steps), 2)
    out["affine_only_ms"] = round(1e3 * timed(
        jax.jit(lambda k, v: random_affine(k, v)), key, xf, steps=steps), 2)
    out["jitter_only_ms"] = round(1e3 * timed(
        jax.jit(lambda k, v: color_jitter(k, v)), key, xf, steps=steps), 2)
    out["rrc_only_ms"] = round(1e3 * timed(
        jax.jit(lambda k, v: random_resized_crop(k, v)), key, xf,
        steps=steps), 2)

    cfg = ContrastiveConfig(batch_size=batch)
    views = jax.block_until_ready(
        jax.jit(lambda k, v: simclr_two_views(k, v))(key, x))

    # Train math only: swap the augment out by feeding pre-made views
    # through a step variant (monkeypatch via closure).
    import cut_detection_tpu.train.contrastive as ctr

    real = ctr.simclr_two_views
    try:
        ctr.simclr_two_views = lambda k, v, size=(144, 256): views
        step2, _ = make_contrastive_step(cfg)
        state = init_contrastive_state(jax.random.PRNGKey(0), cfg)
        jstep = jax.jit(step2)

        def run(s):
            s2, m = jstep(s, key, x)
            return m["loss"]

        out["train_math_ms"] = round(1e3 * timed(run, state, steps=steps), 2)
    finally:
        ctr.simclr_two_views = real
    print(json.dumps(out))


if __name__ == "__main__":
    main()
