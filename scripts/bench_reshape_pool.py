"""Does XLA fuse reshape+max pooling into the conv producer?

``reduce_window`` never fuses into a convolution, so the bf16_full
pipeline round-trips layer 1's [144,256,48] activation through HBM
(~7 MB/frame).  A 3x3/3 floor-mode maxpool is also expressible as
slice -> reshape [.., H/3, 3, W/3, 3, C] -> max over the window axes —
plain reduces that XLA's fusion machinery CAN sink into producers.
This measures the full classify graph both ways on the TPU.

Usage: python scripts/bench_reshape_pool.py [batch] [steps]
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
    _glued_apply,
    fold_preprocess,
    load_default_net,
)
from cut_detection_tpu.models.frame_conv import apply_frame_linear
from cut_detection_tpu.ops.nn import (
    adaptive_avg_pool,
    batch_norm_infer,
    conv2d_same,
    flatten_nchw_order,
)


def max_pool_reshape(x, window: int = 3):
    """Floor-mode maxpool via slice+reshape+max (fusible reduces)."""
    b, h, w, c = x.shape
    oh, ow = h // window, w // window
    x = x[:, :oh * window, :ow * window, :]
    x = x.reshape(b, oh, window, ow, window, c)
    return jnp.max(x, axis=(2, 4))


def main() -> None:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    net, _ = load_default_net(precision="bfloat16_full")
    bundle = jax.tree_util.tree_map(jnp.asarray, fold_preprocess(net.bundle))
    cd = net.compute_dtype
    rng = np.random.default_rng(0)
    x = jax.device_put(
        rng.integers(0, 256, size=(batch, 144, 256, 3), dtype=np.uint8))

    def net_reshape_pool(frames_u8):
        acts = frames_u8.astype(jnp.float32)
        for p, s in zip(bundle["conv"]["params"], bundle["conv"]["state"]):
            z = conv2d_same(acts, p["kernel"], p["bias"], compute_dtype=cd)
            z = jax.nn.relu(z)
            z = max_pool_reshape(z, 3)
            acts = batch_norm_infer(z, s["mean"], s["var"], p["gamma"],
                                    p["beta"])
        feats = flatten_nchw_order(adaptive_avg_pool(
            acts.astype(jnp.float32), net.conv_cfg.average_pool_size))
        logits, _ = apply_frame_linear(bundle["linear"]["params"],
                                       bundle["linear"]["state"], feats,
                                       net.linear_cfg, compute_dtype=cd)
        return logits

    def net_shipped(frames_u8):
        return _glued_apply(bundle, frames_u8.astype(jnp.float32),
                            conv_cfg=net.conv_cfg,
                            linear_cfg=net.linear_cfg, compute_dtype=cd)

    # Parity first.
    ref = np.asarray(jax.jit(net_shipped)(x))
    got = np.asarray(jax.jit(net_reshape_pool)(x))
    out = {
        "batch": batch,
        "max_logit_diff": float(np.abs(ref - got).max()),
        "argmax_flips": int((ref.argmax(1) != got.argmax(1)).sum()),
    }

    def looped(graph):
        @jax.jit
        def run(frames_u8, k):
            def body(i, acc):
                v = graph(frames_u8 + i.astype(jnp.uint8))
                return acc + jnp.sum(v.astype(jnp.float32))
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))
        return run

    for name, graph in [("reshape_pool", net_reshape_pool),
                        ("shipped", net_shipped)]:
        run = looped(graph)
        float(run(x, 1))
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(x, steps))
            reps.append((time.perf_counter() - t0) / steps)
        out[name + "_fps"] = round(batch / sorted(reps)[1], 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
