"""Per-call cost of the deferred-affine ring term: full canvas vs strip.

probe_int8_rung.py showed the device-resident fori_loop bench is blind to
the ring term — it is loop-invariant (depends only on the bundle) and XLA
hoists it, so strip vs full-canvas measure identically there.  Real
pipeline calls (one jitted step per frame batch; pipeline.py, serve) pay
the ring on EVERY call.  This probe defeats hoisting by making the affine
bias data-dependent on the loop index (numerically unchanged: +0 via a
dynamic predicate), isolating the per-call ring cost that
models/layers.const_conv_ring replaces.

Shapes: the uint8_chain/int8_mxu mid-stack ring inputs — layer 2 consumes
48x85 (post pool1), layer 3 consumes 16x28 (post pool2), both 48ch.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_ring_cost.py
"""

from __future__ import annotations

import json
import time

import numpy as np

from cut_detection_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from cut_detection_tpu.models.layers import const_conv_ring
from cut_detection_tpu.ops.nn import conv2d_same

STEPS = 64


def loop_timed(variant, steps=STEPS):
    @jax.jit
    def run(b, k):
        def body(i, acc):
            # Numerically b, but data-dependent so LICM cannot hoist.
            bi = b + jnp.where(i < 0, jnp.float32(1), jnp.float32(0))
            return acc + jnp.sum(variant(bi).astype(jnp.float32))
        return jax.lax.fori_loop(0, k, body, jnp.float32(0))

    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal(48).astype(np.float32))
    float(run(b, 2))
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(b, steps))
        reps.append((time.perf_counter() - t0) / steps)
    return sorted(reps)[1] * 1e3


def main():
    rng = np.random.default_rng(1)
    res = {}
    for name, (h, w) in [("l2", (48, 85)), ("l3", (16, 28))]:
        k = jnp.asarray(rng.standard_normal((3, 3, 48, 48)).astype(np.float32))
        bias = jnp.asarray(rng.standard_normal(48).astype(np.float32))
        res[f"ring_{name}_full"] = loop_timed(
            lambda b, k=k, bias=bias, h=h, w=w: conv2d_same(
                jnp.broadcast_to(b, (1, h, w, 48)), k, bias,
                compute_dtype="bfloat16_full"))
        res[f"ring_{name}_strip"] = loop_timed(
            lambda b, k=k, bias=bias, h=h, w=w: const_conv_ring(
                b, k, bias, h, w))
    print(json.dumps({k: round(v, 4) for k, v in res.items()}))


if __name__ == "__main__":
    main()
