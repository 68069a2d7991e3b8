"""Fully on-device segmentation smoother (RLE + orphan glue + merge).

The host implementation (segmentation/glue.py) replicates the reference's
Python-loop semantics directly.  This module runs the SAME algorithm as a
jit-compiled program — the north-star formulation (BASELINE.md: the
per-frame label -> segment logic "rewritten as a jax.lax scan/while
smoother instead of a Python loop") — so the entire pipeline can stay on
device: classify -> reduce -> smooth, with only the final (start, label)
rows leaving the chip.

Representation: fixed-capacity tables ([max_segments] rows) plus an
``active`` mask; "deleting" a row deactivates it, and the reference's
post-deletion adjacency maps exactly onto previous/next *active* row.
Every reference rule is preserved:

- orphan definition (frameID/segmentation.py:12-17)
- least-confident-first merge order, first index on ties (:103-107)
- first -> next, last -> prev, interior -> strictly-longer prev else next
  (:110-156)
- the mis-parenthesized mean update behind ``bug_compat`` (:79-82)
- adjacent merge: repeatedly merge the FIRST equal-type pair, left into
  right (:168-183)

Equivalence with the host path is pinned by randomized tests
(tests/test_device_glue.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from cut_detection_tpu.segmentation.rle import device_frame_scores

# Plain Python float: a module-level jnp constant would initialize the JAX
# backend at import time (before CLIs can select a platform).
_INF = float("inf")


def _build_tables(conf, pred, max_segments: int):
    """RLE into fixed-capacity tables; rows >= count are inactive.

    Segment score sums use a *sequential* scan (left-to-right within each
    segment) so they are bitwise identical to the host table's
    ``np.add.reduceat`` — the merge loop's argmin ordering is sensitive to
    last-ulp differences (especially under the bug-compat inflated means),
    so matching the reduction order exactly is what makes the device path
    reproduce the host/reference merge order.
    """
    n = conf.shape[0]
    boundary = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), (pred[1:] != pred[:-1]).astype(jnp.int32)]
    )
    seg_id = jnp.cumsum(boundary)
    count = seg_id[-1] + 1
    idx = jnp.arange(n)
    starts = jax.ops.segment_min(idx, seg_id, num_segments=max_segments)
    ends = jax.ops.segment_max(idx, seg_id, num_segments=max_segments)
    types = jax.ops.segment_max(pred.astype(jnp.int32), seg_id,
                                num_segments=max_segments)

    def step(carry, x):
        c, is_start = x
        s = jnp.where(is_start, c, carry + c)
        return s, s

    is_start = boundary.astype(bool).at[0].set(True)
    _, running = jax.lax.scan(step, jnp.float32(0), (conf, is_start))
    active = jnp.arange(max_segments) < count
    safe_ends = jnp.where(active, ends, 0)
    sums = running[safe_ends]
    # int32 throughout: frame indices are < 2^31 and x64 is disabled.
    lengths = jnp.where(active, (ends - starts + 1).astype(jnp.int32), 0)
    means = jnp.where(active,
                      sums / jnp.maximum(lengths, 1).astype(jnp.float32), 0.0)
    return {
        "start": jnp.where(active, starts, 0).astype(jnp.int32),
        "end": jnp.where(active, ends, 0).astype(jnp.int32),
        "type": jnp.where(active, types, -1),
        "length": lengths,
        "mean": means.astype(jnp.float32),
        "active": active,
    }, count


def _orphan_mask(te, k1, kb):
    t, l = te["type"], te["length"]
    return te["active"] & (
        ((t != 2) & (l < k1)) | ((t == 2) & (l < kb))
    )


def _neighbors(active, target):
    """(prev, next) active row indices around ``target`` (-1 / S if none)."""
    s = active.shape[0]
    idx = jnp.arange(s)
    prev = jnp.max(jnp.where(active & (idx < target), idx, -1))
    nxt = jnp.min(jnp.where(active & (idx > target), idx, s))
    return prev, nxt


def _merge(te, orphan, neighbor, bug_compat: bool):
    """Merge row ``orphan`` into ``neighbor`` (segmentation.py:69-89)."""
    start = jnp.where(orphan < neighbor, te["start"][orphan],
                      te["start"][neighbor])
    end = jnp.where(orphan < neighbor, te["end"][neighbor],
                    te["end"][orphan])
    m_n, m_o = te["mean"][neighbor], te["mean"][orphan]
    l_n = te["length"][neighbor].astype(jnp.float32)
    l_o = te["length"][orphan].astype(jnp.float32)
    if bug_compat:
        mean = (m_n * l_n + m_o * l_o) / l_n + l_o
    else:
        mean = (m_n * l_n + m_o * l_o) / (l_n + l_o)
    return {
        "start": te["start"].at[neighbor].set(start),
        "end": te["end"].at[neighbor].set(end),
        "type": te["type"],
        "length": te["length"].at[neighbor].set(end - start + 1),
        "mean": te["mean"].at[neighbor].set(mean),
        "active": te["active"].at[orphan].set(False),
    }


def _glue_loop(te, k1, kb, bug_compat: bool):
    s = te["active"].shape[0]

    def cond(te):
        # >1 active row AND at least one orphan (the reference would raise
        # on a single orphan row; we stop, see glue.py's count>1 guard).
        n_active = jnp.sum(te["active"])
        return (n_active > 1) & jnp.any(_orphan_mask(te, k1, kb))

    def body(te):
        mask = _orphan_mask(te, k1, kb)
        # Least confident orphan; first index on ties (argmin semantics).
        target = jnp.argmin(jnp.where(mask, te["mean"], _INF))
        prev, nxt = _neighbors(te["active"], target)
        neighbor = jnp.where(
            prev < 0,
            nxt,
            jnp.where(
                nxt >= s,
                prev,
                jnp.where(te["length"][prev] > te["length"][nxt], prev, nxt),
            ),
        )
        return _merge(te, target, neighbor, bug_compat)

    return jax.lax.while_loop(cond, body, te)


def _adjacent_loop(te, bug_compat: bool):
    s = te["active"].shape[0]
    idx = jnp.arange(s)

    def next_active(te):
        """next_active[i] = smallest active j > i (or s)."""
        # Reverse-min scan over where(active, idx, s).
        vals = jnp.where(te["active"], idx, s)
        rev = jnp.flip(vals)
        scanned = jax.lax.associative_scan(jnp.minimum, rev)
        nxt_incl = jnp.flip(scanned)  # min active >= i
        # Shift to strictly-greater: next_active[i] = nxt_incl[i+1].
        return jnp.concatenate([nxt_incl[1:], jnp.array([s])])

    def pair_mask(te):
        nxt = next_active(te)
        valid = te["active"] & (nxt < s)
        same = te["type"] == te["type"][jnp.clip(nxt, 0, s - 1)]
        return valid & same, nxt

    def cond(te):
        m, _ = pair_mask(te)
        return jnp.any(m)

    def body(te):
        m, nxt = pair_mask(te)
        # FIRST matching pair (segmentation.py:175 takes where(...)[0][0]).
        left = jnp.argmax(m)
        right = nxt[left]
        return _merge(te, left, right, bug_compat)

    return jax.lax.while_loop(cond, body, te)


@functools.partial(jax.jit,
                   static_argnames=("max_segments", "bug_compat"))
def device_smooth(conf, pred, real_threshold=100, blank_threshold=10, *,
                  max_segments: int = 8192, bug_compat: bool = True):
    """Full smoother on device: per-frame (conf, pred) -> segment table.

    Returns ``(start_frames, frame_types, active, initial_count,
    score_means, end_frames)`` padded to ``max_segments``; rows with
    ``active`` False are padding.  Compact on host with ``start[active]``.
    ``score_means`` are the post-merge means — under ``bug_compat`` these
    carry the reference's mis-parenthesized inflation
    (frameID/segmentation.py:79-82), exactly like the host table's.
    ``initial_count`` is the raw RLE segment count — if it exceeds
    ``max_segments`` the result is invalid (tables truncated); callers
    must check (``smooth_logits`` raises).  Noisy per-frame argmax
    produces ~1 segment per few frames in the worst case, so bound
    accordingly; the host path remains for unbounded inputs.
    """
    te, count = _build_tables(conf.astype(jnp.float32),
                              pred.astype(jnp.int32), max_segments)
    te = _glue_loop(te, real_threshold, blank_threshold, bug_compat)
    te = _adjacent_loop(te, bug_compat)
    return te["start"], te["type"], te["active"], count, te["mean"], te["end"]


def smooth_logits(logits, real_threshold=100, blank_threshold=10, *,
                  max_segments: int = 8192):
    """Convenience: [N, C] logits -> compacted (start_frames, labels) on host."""
    conf, pred = device_frame_scores(logits)
    start, typ, active, count, _, _ = device_smooth(
        conf, pred, real_threshold, blank_threshold,
        max_segments=max_segments)
    import numpy as np

    if int(count) > max_segments:
        raise ValueError(
            f"{int(count)} initial segments exceed max_segments="
            f"{max_segments}; raise the bound or use the host path")
    act = np.asarray(active)
    return np.asarray(start)[act], np.asarray(typ)[act]
