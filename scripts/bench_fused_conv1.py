"""TPU micro-benchmark for ops/pallas/fused_conv1 (layer-1 HBM fusion).

Measures, on the real chip, with prod-net weights at the prod input shape
(B x 144 x 256, bfloat16_full numerics):

  1. parity    — fused kernel vs the shipped XLA layer-1 graph (max |diff|
                 on bf16 outputs, and end-to-end argmax agreement when the
                 remaining layers run through the shipped stack)
  2. l1_fused  — frames/sec through the fused kernel alone
  3. l1_xla    — frames/sec through the shipped XLA layer-1 graph alone
  4. e2e_fused — frames/sec full net with the fused kernel as layer 1
  5. e2e_xla   — frames/sec full shipped net (the bench.py headline graph)

Timing uses the same on-device fori_loop trick as bench.py: the input is
perturbed with the iteration index so XLA can't hoist, and a scalar
accumulates so every iteration is live.  Values are fetched (not merely
block_until_ready'd) because the axon relay returns early otherwise.

Usage:  python scripts/bench_fused_conv1.py [batch] [steps] [stage]
        stage in {all, parity, l1, e2e} (default all) — staged runs keep
        each TPU process short; the persistent compilation cache carries
        compiles across stages.
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

from cut_detection_tpu.models.assembly import (
    fold_preprocess,
    load_default_net,
)
from cut_detection_tpu.models.frame_conv import (
    apply_frame_conv,
    apply_frame_linear,
)
from cut_detection_tpu.models.layers import apply_conv_block
from cut_detection_tpu.ops.nn import adaptive_avg_pool, flatten_nchw_order
from cut_detection_tpu.ops.pallas.fused_conv1 import fused_conv1_pool
from cut_detection_tpu.ops.pallas.fused_conv_block import fused_conv_block


def timed_loop(fn, *args, steps: int, min_seconds: float = 3.0) -> float:
    """Median-of-3 seconds per call of jitted fn(*args) (fn loops `steps`)."""
    float(fn(*args, 1))  # compile + warm
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(*args, steps))
        reps.append((time.perf_counter() - t0) / steps)
    return sorted(reps)[1]


def main() -> None:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    stage = sys.argv[3] if len(sys.argv) > 3 else "all"

    net, _ = load_default_net(precision="bfloat16_full")
    bundle = jax.tree_util.tree_map(jnp.asarray, fold_preprocess(net.bundle))
    p0, s0 = bundle["conv"]["params"][0], bundle["conv"]["state"][0]
    cd = net.compute_dtype

    rng = np.random.default_rng(0)
    x = jax.device_put(
        rng.integers(0, 256, size=(batch, 144, 256, 3), dtype=np.uint8))

    def l1_xla_graph(frames_u8):
        """Shipped layer-1: conv(folded weights) -> ReLU -> pool -> BN."""
        xf = frames_u8.astype(jnp.float32)
        z, _ = apply_conv_block(p0, s0, xf, train=False, compute_dtype=cd)
        return z

    def l1_fused_graph(frames_u8):
        return fused_conv1_pool(frames_u8, p0["kernel"], p0["bias"],
                                p0["gamma"], p0["beta"], s0["mean"],
                                s0["var"], out_dtype=jnp.bfloat16)

    def rest(l1):
        feats, _ = apply_frame_conv(bundle["conv"]["params"][1:],
                                    bundle["conv"]["state"][1:],
                                    l1.astype(jnp.float32), net.conv_cfg,
                                    compute_dtype=cd)
        logits, _ = apply_frame_linear(bundle["linear"]["params"],
                                       bundle["linear"]["state"], feats,
                                       net.linear_cfg, compute_dtype=cd)
        return logits

    def head(acts):
        feats = flatten_nchw_order(adaptive_avg_pool(
            acts.astype(jnp.float32), net.conv_cfg.average_pool_size))
        logits, _ = apply_frame_linear(bundle["linear"]["params"],
                                       bundle["linear"]["state"], feats,
                                       net.linear_cfg, compute_dtype=cd)
        return logits

    def rest_fused(l1):
        """Layers 2+3 through fused_conv_block, then the FC head."""
        acts = l1
        for p, s in zip(bundle["conv"]["params"][1:],
                        bundle["conv"]["state"][1:]):
            acts = fused_conv_block(acts, p["kernel"], p["bias"],
                                    p["gamma"], p["beta"], s["mean"],
                                    s["var"], out_dtype=jnp.bfloat16)
        return head(acts)

    # --- round-3 mid-stack experiment: the VERDICT-named remaining attack.
    # Layer 1 stays the uint8_pool XLA block (the fastest known layer-1
    # realization); layers 2+3 run through the fused Mosaic block so their
    # conv activations + inter-layer tensors never touch HBM.  Compared
    # against the full shipped uint8_chain graph.
    net_u8, _ = load_default_net(precision="uint8_chain")
    bundle_u8 = jax.tree_util.tree_map(jnp.asarray,
                                       fold_preprocess(net_u8.bundle))
    pu0 = bundle_u8["conv"]["params"][0]
    su0 = bundle_u8["conv"]["state"][0]

    def l1_u8_graph(frames_u8):
        """Shipped uint8_pool layer-1 (folded weights, u8 pooled store)."""
        xf = frames_u8.astype(jnp.float32)
        z, _ = apply_conv_block(pu0, su0, xf, train=False,
                                compute_dtype="uint8_pool")
        return z  # bf16 [B, 48, 85, 48]

    from cut_detection_tpu.ops.pallas.fused_block_pm import fused_conv_block_pm

    def mid_fused(l1):
        # Pixel-major fused blocks chain NHWC-native, zero relayouts
        # (the round-2 channel-major kernel no longer compiles on the
        # current Mosaic toolchain — lane-strided loads were dropped;
        # see fused_block_pm's module docstring).
        acts = l1
        for p, s in zip(bundle_u8["conv"]["params"][1:],
                        bundle_u8["conv"]["state"][1:]):
            acts = fused_conv_block_pm(acts, p["kernel"], p["bias"],
                                       p["gamma"], p["beta"], s["mean"],
                                       s["var"], out_dtype=jnp.bfloat16)
        return head(acts)

    def e2e_u8mid_graph(frames_u8):
        return mid_fused(l1_u8_graph(frames_u8))

    def e2e_chain_graph(frames_u8):
        from cut_detection_tpu.models.assembly import _glued_apply

        return _glued_apply(bundle_u8, frames_u8.astype(jnp.float32),
                            conv_cfg=net_u8.conv_cfg,
                            linear_cfg=net_u8.linear_cfg,
                            compute_dtype="uint8_chain")

    out = {"batch": batch, "stage": stage}

    if stage in ("mid",):
        ref_logits = np.asarray(jax.jit(e2e_chain_graph)(x))
        got_logits = np.asarray(jax.jit(e2e_u8mid_graph)(x))
        out["mid_argmax_flips"] = int(
            (ref_logits.argmax(1) != got_logits.argmax(1)).sum())
        out["mid_max_logit_diff"] = float(
            np.abs(ref_logits - got_logits).max())

    if stage in ("all", "parity"):
        ref_l1 = np.asarray(jax.jit(l1_xla_graph)(x), dtype=np.float32)
        got_l1 = np.asarray(jax.jit(l1_fused_graph)(x), dtype=np.float32)
        d = np.abs(ref_l1 - got_l1)
        out["l1_max_diff"] = float(d.max())
        out["l1_frac_gt_1e3"] = float((d > 1e-3).mean())
        out["l1_p999_diff"] = float(np.quantile(d, 0.999))
        ref_logits = np.asarray(jax.jit(lambda v: rest(l1_xla_graph(v)))(x))
        got_logits = np.asarray(jax.jit(lambda v: rest(l1_fused_graph(v)))(x))
        out["argmax_flips"] = int(
            (ref_logits.argmax(1) != got_logits.argmax(1)).sum())

    def looped(graph):
        @jax.jit
        def run(frames_u8, k):
            def body(i, acc):
                v = graph(frames_u8 + i.astype(jnp.uint8))
                return acc + jnp.sum(v.astype(jnp.float32))
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))
        return run

    if stage in ("all", "block"):
        ref_logits = np.asarray(jax.jit(lambda v: rest(l1_xla_graph(v)))(x))
        full_logits = np.asarray(
            jax.jit(lambda v: rest_fused(l1_fused_graph(v)))(x))
        out["full_argmax_flips"] = int(
            (ref_logits.argmax(1) != full_logits.argmax(1)).sum())
        out["full_max_logit_diff"] = float(
            np.abs(ref_logits - full_logits).max())

    graphs = {
        "l1_fused": l1_fused_graph,
        "l1_xla": l1_xla_graph,
        "e2e_fused": lambda v: rest(l1_fused_graph(v)),
        "e2e_xla": lambda v: rest(l1_xla_graph(v)),
        "e2e_allfused": lambda v: rest_fused(l1_fused_graph(v)),
        "e2e_u8mid": e2e_u8mid_graph,
        "e2e_chain": e2e_chain_graph,
    }
    wanted = {"all": list(graphs), "l1": ["l1_fused", "l1_xla"],
              "e2e": ["e2e_fused", "e2e_xla"],
              "block": ["e2e_allfused", "e2e_xla"],
              "mid": ["e2e_u8mid", "e2e_chain"], "parity": []}[stage]
    for name in wanted:
        sec = timed_loop(looped(graphs[name]), x, steps=steps)
        out[name + "_fps"] = round(batch / sec, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
