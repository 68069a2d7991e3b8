"""Stage-bisection microbenchmark for the fused conv1 kernel on TPU.

Times cut-down variants of the kernel to locate where per-image time
goes (the full kernel measured 2x slower than XLA's layer-1 graph and
estimates said the MXU work alone is ~6 us/img, so ~20+ us/img is
overhead somewhere):

  v_cast  — uint8 block in + u8->bf16 cast, tiny store
  v_taps  — + per-strip im2col tap assembly (27 lane-slice copies)
  v_dotn  — + natural-orientation dot  W[48,32] @ A[32,m] -> [48,m]
  v_dott  — + transposed dot  A as lhs -> [m,48] (the committed layout)
  v_tpose — v_dotn + tpu.transpose of z to [m,48]
  v_full  — v_tpose + strided-phase x-pool + y-loop + BN + NHWC store
            (natural dot + proven sublane pooling)

Each variant writes enough output that nothing can be elided; all run
at the prod shape (B x 144 x 256).  Usage:
    python scripts/profile_fused_conv1.py [batch] [steps] [variants...]
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np

from cut_detection_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, out_ref, xbf_ref, a_ref, z_ref, v_ref, *,
            h, w, ws, strip_rows, out_w, stage):
    n_strips = h // strip_rows
    pooled_rows = strip_rows // 3
    ws3 = ws // 3
    flat = (h + 2) * ws
    m = strip_rows * ws

    @pl.when(pl.program_id(0) == 0)
    def _init():
        a_ref[27:32, :] = jnp.zeros((5, m), jnp.bfloat16)
        xbf_ref[:, 0:1] = jnp.zeros((3, 1), jnp.bfloat16)
        xbf_ref[:, flat + 1:flat + 2] = jnp.zeros((3, 1), jnp.bfloat16)

    xbf_ref[:, 1:flat + 1] = (x_ref[0].astype(jnp.int32)
                              .astype(jnp.float32).astype(jnp.bfloat16))
    if stage == "cast":
        out_ref[0, 0:48, :] = (jnp.zeros((48, 128), jnp.float32)
                               + xbf_ref[0:1, 1:129].astype(jnp.float32))
        return

    for s in range(n_strips):
        base = s * strip_rows * ws
        for dy in range(3):
            for dx in range(3):
                for c in range(3):
                    k = (dy * 3 + dx) * 3 + c
                    start = base + dy * ws + dx
                    a_ref[k, :] = xbf_ref[c, pl.ds(start, m)]
        if stage == "taps":
            continue

        if stage == "dott":
            acc = jax.lax.dot_general(
                a_ref[:], w_ref[:],
                dimension_numbers=(((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # [m, 48]
            z_ref[pl.ds(0, m), 0:48] = acc
            continue

        acc = jax.lax.dot_general(
            w_ref[:], a_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [48, m]
        if stage == "dotn":
            # Touch the result cheaply: accumulate a 128-lane slab.
            out_ref[0, 0:48, :] += acc[:, 0:128]
            continue

        zt = jnp.transpose(acc, (1, 0))  # [m, 48] via tpu.transpose
        z = jnp.maximum(zt, 0.0).astype(jnp.bfloat16).astype(jnp.float32)
        if stage == "tpose":
            out_ref[0, 0:48, :] += jnp.transpose(z[0:128, :], (1, 0))
            continue

        z_ref[:, :] = z
        v_ref[:, :] = jnp.maximum(
            jnp.maximum(z_ref[pl.Slice(0, m // 3, 3), :],
                        z_ref[pl.Slice(1, m // 3, 3), :]),
            z_ref[pl.Slice(2, m // 3, 3), :])
        for t in range(pooled_rows):
            r0 = 3 * t * ws3
            row = jnp.maximum(
                jnp.maximum(v_ref[pl.ds(r0, ws3), :],
                            v_ref[pl.ds(r0 + ws3, ws3), :]),
                v_ref[pl.ds(r0 + 2 * ws3, ws3), :])
            out_ref[0, 0:out_w, 0:48] += row[:out_w, :]


def build(variant: str, batch: int, strip_cap: int = 12):
    h, w = 144, 256
    ws = 3 * (-(-(w + 1) // 3))
    from cut_detection_tpu.ops.pallas.fused_conv1 import _strip_rows_for
    strip_rows = _strip_rows_for(h, cap=strip_cap)
    out_w = (w - 3) // 3 + 1
    m = strip_rows * ws
    flat = (h + 2) * ws

    kern = functools.partial(_kernel, h=h, w=w, ws=ws,
                             strip_rows=strip_rows, out_w=out_w,
                             stage=variant)

    @jax.jit
    def run(xflat, w2t, k):
        def body(i, acc):
            xi = xflat + i.astype(jnp.uint8)
            o = pl.pallas_call(
                kern,
                grid=(batch,),
                in_specs=[
                    pl.BlockSpec((1, 3, flat), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, 128, 128), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((batch, 128, 128),
                                               jnp.float32),
                scratch_shapes=[
                    pltpu.VMEM((3, flat + 2), jnp.bfloat16),
                    pltpu.VMEM((32, m), jnp.bfloat16),
                    pltpu.VMEM((m, 48), jnp.float32),
                    pltpu.VMEM((m // 3, 48), jnp.float32),
                ],
            )(xi, w2t)
            return acc + jnp.sum(o)
        return jax.lax.fori_loop(0, k, body, jnp.float32(0))

    return run


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    variants = sys.argv[3:] or ["cast", "taps", "dotn", "dott", "tpose",
                                "full"]

    h, w = 144, 256
    ws = 3 * (-(-(w + 1) // 3))
    rng = np.random.default_rng(0)
    xp = rng.integers(0, 256, size=(batch, 3, (h + 2) * ws),
                      dtype=np.uint8)
    xflat = jax.device_put(xp)
    w2t = jax.device_put(
        rng.normal(0, 0.1, size=(48, 32)).astype(np.float32)
        .astype(jnp.bfloat16))

    out = {"batch": batch}
    for vname in variants:
        run = build(vname, batch)
        try:
            float(run(xflat, w2t, 1))
        except Exception as e:  # noqa: BLE001
            out[vname] = f"FAIL: {str(e).splitlines()[0][:120]}"
            print(json.dumps(out))
            continue
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(xflat, w2t, steps))
            reps.append((time.perf_counter() - t0) / steps)
        sec = sorted(reps)[1]
        out[vname + "_us_per_img"] = round(1e6 * sec / batch, 2)
        out[vname + "_fps"] = round(batch / sec, 1)
        print(json.dumps({vname: out[vname + "_us_per_img"]}))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
