"""Stage bisection for the uint8_chain classify graph.

Where does the remaining time go?  The dominant HBM tensor is conv1's
full-res uint8 output round trip (write 1.77 MB/frame + pool read); the
open questions are (a) whether XLA fuses the quantize epilogue into the
conv (if not, a bf16 3.5 MB intermediate doubles conv1 traffic), and
(b) whether reduce_window on uint8 runs at byte-granularity speed.

Each variant runs device-resident in a fori_loop with an iteration-
perturbed input and a scalar accumulator (the bench_ours pattern —
per-call timing through the axon relay is dispatch/fetch-dominated and
meaningless for ms-scale kernels).

Variants (batch 128, 256x144 frames), ms per iteration:
  conv1_plain      conv only, bf16 out (no epilogue)
  conv1_quant      conv + current epilogue (relu, /scale, rint, clip, u8)
  conv1_quant_fold conv with scale folded into weights + rint/clip only
  pool_rw          reduce_window 3x3/3 max on the u8 conv-out shape
  pool_reshape     same pool as reshape + max over window axes
  chain_full       the shipped uint8_chain apply
  chain_fold       uint8_chain with conv1 scale-fold + reshape pools
  chain_b256       chain_full at batch 256

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_u8chain.py
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
    load_default_net,
)
from cut_detection_tpu.models.layers import conv_quantize_scale
from cut_detection_tpu.ops.nn import conv2d_same, max_pool

B, H, W = 128, 144, 256
STEPS = 64


def loop_timed(variant, x, steps=STEPS):
    """ms/iteration of ``variant`` in a device-resident fori_loop."""

    @jax.jit
    def run(x, k):
        def body(i, acc):
            xi = x + i.astype(x.dtype)  # defeat hoisting/dedup
            return acc + jnp.sum(variant(xi).astype(jnp.float32))
        return jax.lax.fori_loop(0, k, body, jnp.float32(0))

    float(run(x, 2))  # compile + warm (value fetch: relay-safe sync)
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(x, steps))
        reps.append((time.perf_counter() - t0) / steps)
    return sorted(reps)[1] * 1e3


def main():
    net, _ = load_default_net(precision="uint8_chain")
    bundle = jax.tree_util.tree_map(jnp.asarray, fold_preprocess(net.bundle))
    p0 = bundle["conv"]["params"][0]
    s0 = bundle["conv"]["state"][0]
    rng = np.random.default_rng(0)
    frames = jax.device_put(
        rng.integers(0, 256, (B, H, W, 3), dtype=np.uint8))
    res = {}

    def conv1_plain(x):
        return conv2d_same(x.astype(jnp.float32), p0["kernel"], p0["bias"],
                           compute_dtype="bfloat16_full")

    res["conv1_plain"] = loop_timed(conv1_plain, frames)

    def conv1_quant(x):
        z = conv2d_same(x.astype(jnp.float32), p0["kernel"], p0["bias"],
                        compute_dtype="bfloat16_full")
        z = jax.nn.relu(z).astype(jnp.float32)
        scale = conv_quantize_scale(s0)
        return jnp.clip(jnp.rint(z / scale), 0.0, 255.0).astype(jnp.uint8)

    res["conv1_quant"] = loop_timed(conv1_quant, frames)

    scale0 = conv_quantize_scale(s0)
    kf = jnp.asarray(p0["kernel"], jnp.float32) / scale0[None, None, None, :]
    bf = jnp.asarray(p0["bias"], jnp.float32) / scale0

    def conv1_quant_fold(x):
        z = conv2d_same(x.astype(jnp.float32), kf, bf,
                        compute_dtype="bfloat16_full")
        z = jax.nn.relu(z).astype(jnp.float32)
        return jnp.clip(jnp.rint(z), 0.0, 255.0).astype(jnp.uint8)

    res["conv1_quant_fold"] = loop_timed(conv1_quant_fold, frames)

    q = jax.device_put(rng.integers(0, 256, (B, H, W, 48), dtype=np.uint8))

    def pool_rw(x):
        return max_pool(x, 3)

    res["pool_rw"] = loop_timed(pool_rw, q)

    def pool_reshape(x):
        hh, ww = (H // 3) * 3, (W // 3) * 3
        x = x[:, :hh, :ww, :]
        x = x.reshape(B, hh // 3, 3, ww // 3, 3, 48)
        return jnp.max(x, axis=(2, 4))

    res["pool_reshape"] = loop_timed(pool_reshape, q)

    def chain_full(x):
        return _glued_apply(bundle, x.astype(jnp.float32),
                            conv_cfg=net.conv_cfg,
                            linear_cfg=net.linear_cfg,
                            compute_dtype="uint8_chain")

    res["chain_full"] = loop_timed(chain_full, frames)
    res["chain_full_fps"] = round(B / res["chain_full"] * 1e3, 1)

    frames256 = jax.device_put(
        rng.integers(0, 256, (256, H, W, 3), dtype=np.uint8))
    res["chain_b256"] = loop_timed(chain_full, frames256)
    res["chain_b256_fps"] = round(256 / res["chain_b256"] * 1e3, 1)
    print(json.dumps({k: round(v, 3) for k, v in res.items()}))


if __name__ == "__main__":
    main()
