"""Stage bisection for the int8_mxu rung's 0.60x same-window result.

probe_int8_rung.py measured the full int8_mxu graph at 0.60x uint8_chain
(54.0k vs 90.7k fps same-window).  This isolates WHERE the integer path
loses: the int8 conv lowering itself, the ring-correction convs, or the
int8 requantize epilogue.  Variants (batch 128, conv1 shape 144x256x3 ->
48ch, and the mid-stack conv2 shape 48x85x48 -> 48ch), ms/iter:

  c1_bf16   conv1 as bf16 operands (uint8_chain's lowering)
  c1_i8     conv1 as int8 x int8 -> int32 (conv2d_same_i8)
  c2_bf16   conv2 bf16 (dense bf16 input)
  c2_i8     conv2 int8 (int8 input straight from HBM)
  c2_u8cvt  conv2 bf16 fed by a uint8 input converted in-graph
            (uint8_chain's real mid-stack pattern, conversion cost incl.)
  ring2     conv2-shaped batch-1 ring-correction conv alone

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_int8_stages.py
"""

from __future__ import annotations

import json
import time

import numpy as np

from cut_detection_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from cut_detection_tpu.ops.nn import conv2d_same, conv2d_same_i8

B = 128
STEPS = 64


def loop_timed(variant, x, steps=STEPS):
    @jax.jit
    def run(x, k):
        def body(i, acc):
            xi = x + i.astype(x.dtype)
            return acc + jnp.sum(variant(xi).astype(jnp.float32))
        return jax.lax.fori_loop(0, k, body, jnp.float32(0))

    float(run(x, 2))
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(x, steps))
        reps.append((time.perf_counter() - t0) / steps)
    return sorted(reps)[1] * 1e3


def main():
    rng = np.random.default_rng(0)
    res = {}

    # conv1: 144x256x3 -> 48ch
    k1f = jnp.asarray(rng.standard_normal((3, 3, 3, 48)), jnp.float32)
    k1_bf = k1f.astype(jnp.bfloat16)
    k1_i8 = jnp.asarray(
        rng.integers(-127, 128, (3, 3, 3, 48)), jnp.int8)
    x1_bf = jax.device_put(jnp.asarray(
        rng.standard_normal((B, 144, 256, 3)), jnp.bfloat16))
    x1_i8 = jax.device_put(jnp.asarray(
        rng.integers(-128, 128, (B, 144, 256, 3)), jnp.int8))
    res["c1_bf16"] = loop_timed(
        lambda x: conv2d_same(x, k1_bf, None, compute_dtype="bfloat16_full"),
        x1_bf)
    res["c1_i8"] = loop_timed(lambda x: conv2d_same_i8(x, k1_i8), x1_i8)
    print(json.dumps({k: round(v, 3) for k, v in res.items()}), flush=True)

    # conv2: 48x85x48 -> 48ch (the post-pool mid-stack shape)
    k2_bf = jnp.asarray(
        rng.standard_normal((3, 3, 48, 48)), jnp.bfloat16)
    k2_i8 = jnp.asarray(
        rng.integers(-127, 128, (3, 3, 48, 48)), jnp.int8)
    x2_bf = jax.device_put(jnp.asarray(
        rng.standard_normal((B, 48, 85, 48)), jnp.bfloat16))
    x2_i8 = jax.device_put(jnp.asarray(
        rng.integers(-128, 128, (B, 48, 85, 48)), jnp.int8))
    x2_u8 = jax.device_put(jnp.asarray(
        rng.integers(0, 256, (B, 48, 85, 48)), jnp.uint8))
    res["c2_bf16"] = loop_timed(
        lambda x: conv2d_same(x, k2_bf, None, compute_dtype="bfloat16_full"),
        x2_bf)
    res["c2_i8"] = loop_timed(lambda x: conv2d_same_i8(x, k2_i8), x2_i8)
    res["c2_u8cvt"] = loop_timed(
        lambda x: conv2d_same(x.astype(jnp.bfloat16), k2_bf, None,
                              compute_dtype="bfloat16_full"),
        x2_u8)

    # ring-correction conv alone (batch-1, conv2 shape)
    ring_in = jax.device_put(jnp.asarray(
        rng.standard_normal((1, 48, 85, 48)), jnp.bfloat16))
    res["ring2"] = loop_timed(
        lambda x: conv2d_same(x, k2_bf, None, compute_dtype="bfloat16_full"),
        ring_in)

    print(json.dumps({k: round(v, 3) for k, v in res.items()}))


if __name__ == "__main__":
    main()
