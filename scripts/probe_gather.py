"""Microbenchmark: image-gather realizations on the TPU.

The SimCLR augmentation is gather-latency-bound (docs/ROADMAP.md #6:
~165 ms of the 191 ms fast-augment step is the composed 4-tap gather).
This probe times candidate realizations of the same access pattern to
pick the round-3 attack:

  a. gather2d      — the shipped pattern: vmap of img[ys, xs] with
                     per-pixel 2D indices (XLA general gather).
  b. row_slices    — vmap of per-row dynamic_slice (contiguous-chunk
                     fetches; the 'shear' pass of a 2-pass resample).
  c. onehot_einsum — within-row selection as a one-hot matmul on the
                     MXU (uint8 values in bf16: exact, one nonzero per
                     output column).
  d. two_pass      — full shear decomposition: per-row shift (b) +
                     two one-hot einsums (c) + bit select, both axes.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_gather.py
"""

from __future__ import annotations

import json
import time

import numpy as np

from cut_detection_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

B = 64            # image-views per step (batch 32 x 2 views)
H, W = 360, 640   # 360p originals
OH, OW = 144, 256


def timed(fn, *args, steps=20):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]  # fetch=sync
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        reps.append((time.perf_counter() - t0) / steps)
    return sorted(reps)[1] * 1e3  # ms


def main():
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 256, (B, H, W, 3), dtype=np.uint8))
    imgs_f = imgs.astype(jnp.float32)
    ys = jnp.asarray(rng.integers(0, H, (B, OH, OW)).astype(np.int32))
    xs = jnp.asarray(rng.integers(0, W, (B, OH, OW)).astype(np.int32))
    # Row-monotone variants (what the real access pattern looks like).
    row_starts = jnp.asarray(rng.integers(0, H - 1, (B, H)).astype(np.int32))
    col_vec = jnp.asarray(
        np.sort(rng.integers(0, W, (B, OW)), axis=1).astype(np.int32))

    results = {}

    @jax.jit
    def gather2d(im, yy, xx):
        def one(img, y, x):
            return img[y, x]
        return jax.vmap(one)(im, yy, xx)

    results["a_gather2d_f32"] = timed(gather2d, imgs_f, ys, xs)

    @jax.jit
    def gather2d_u8(im, yy, xx):
        def one(img, y, x):
            return img[y, x]
        return jax.vmap(one)(im, yy, xx)

    results["a_gather2d_u8"] = timed(gather2d_u8, imgs, ys, xs)

    @jax.jit
    def row_slices(im, starts):
        # Per-row vertical shift: row i of the output is row starts[i] of
        # the input (a dynamic_slice per row -> gather with 1xWx3 slices).
        def one(img, st):
            def row(s):
                return jax.lax.dynamic_slice(img, (s, 0, 0), (1, W, 3))[0]
            return jax.vmap(row)(st)
        return jax.vmap(one)(im, starts)

    results["b_row_slices_u8"] = timed(row_slices, imgs, row_starts)

    @jax.jit
    def onehot_einsum(im, cols):
        # Within-row column selection as one-hot matmul (exact for u8
        # values in bf16: products are 0 or the value, one term/output).
        oh = (cols[:, None, :] == jnp.arange(W, dtype=jnp.int32)[None, :,
                                                                 None])
        ohb = oh.astype(jnp.bfloat16)
        return jnp.einsum("bhwc,bwo->bhoc", im.astype(jnp.bfloat16), ohb)

    results["c_onehot_einsum_u8"] = timed(onehot_einsum, imgs, col_vec)

    @jax.jit
    def two_pass(im, starts, cols, starts2, rows2):
        sheared = row_slices_impl(im, starts)
        g0 = onehot_impl(sheared, cols)
        # Vertical pass on the [B, H, OW, 3] intermediate: per-column
        # shift via transpose + row slices, then one-hot over rows.
        t = jnp.swapaxes(g0, 1, 2)  # [B, OW, H, 3]
        sheared2 = row_slices_impl2(t, starts2)
        g = onehot_impl2(sheared2, rows2)
        return jnp.swapaxes(g, 1, 2)

    def row_slices_impl(im, starts):
        def one(img, st):
            def row(s):
                return jax.lax.dynamic_slice(img, (s, 0, 0), (1, W, 3))[0]
            return jax.vmap(row)(st)
        return jax.vmap(one)(im, starts)

    def onehot_impl(im, cols):
        oh = (cols[:, None, :] == jnp.arange(W, dtype=jnp.int32)[None, :,
                                                                 None])
        return jnp.einsum("bhwc,bwo->bhoc", im.astype(jnp.bfloat16),
                          oh.astype(jnp.bfloat16))

    def row_slices_impl2(im, starts):
        # im [B, OW, H, 3]: per-column vertical shift — slice an OH-row
        # window starting at starts[b, ow] -> [B, OW, OH, 3].
        def one(img, st):
            def col(colrows, s):
                return jax.lax.dynamic_slice(colrows, (s, 0), (OH, 3))
            return jax.vmap(col)(img, st)
        return jax.vmap(one)(im, starts)

    def onehot_impl2(im, rows):
        # im [B, OW, OH, 3]; rows one-hot [B, OH, OH] -> [B, OW, OH, 3].
        oh = (rows[:, None, :] == jnp.arange(OH, dtype=jnp.int32)[None, :,
                                                                  None])
        return jnp.einsum("bowc,bwp->bopc", im, oh.astype(jnp.bfloat16))

    starts2 = jnp.asarray(rng.integers(0, H - OH, (B, OW)).astype(np.int32))
    rows2 = jnp.asarray(
        np.sort(rng.integers(0, OH, (B, OH)), axis=1).astype(np.int32))
    results["d_two_pass_u8"] = timed(two_pass, imgs, row_starts, col_vec,
                                     starts2, rows2)

    # Reference point: the shipped fast-augment composed gather.
    from cut_detection_tpu.train.augment import fast_simclr_two_views

    key = jax.random.PRNGKey(0)
    x32 = imgs[:32]
    results["fast_simclr_two_views"] = timed(
        jax.jit(lambda k, x: fast_simclr_two_views(k, x)), key, x32)

    print(json.dumps({k: round(v, 2) for k, v in results.items()}))


if __name__ == "__main__":
    main()
