"""Run-length encoding of per-frame scores + the ``Segmentation`` table.

Reference: frameID/segmentation.py:26-63.  Design split:

- The O(N)-over-frames work (argmax/max, boundary detection, per-segment
  reductions) is vectorized.  ``device_frame_scores`` runs the reduction on
  TPU so only two [N] vectors (confidence + class) ever leave the device;
  ``device_segment_reduce`` additionally does the full RLE on device with a
  static segment-count bound for fused pipelines.
- The ``Segmentation`` class holds the small host-side segment table (same
  ``te`` dict keys as the reference) and delegates the data-dependent merge
  loops to cut_detection_tpu/segmentation/glue.py.

The reference builds per-segment score means with a Python loop over
segments (segmentation.py:54-59) — a host hot spot; here it is a single
``np.add.reduceat`` (host) or ``jax.ops.segment_sum`` (device), computed in
float32 to match torch's dtype semantics.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from cut_detection_tpu.segmentation import glue as _glue
from cut_detection_tpu.segmentation.csv_io import write_segments_csv

# Label vocabulary from frameID/data.py:116, used for CSV output via the
# inverse map (frameID/segmentation.py:8-9).
LAB_ENUM = {"a22": 0, "ez": 1, "b": 2}
INVERSE_LAB_ENUM = {v: k for k, v in LAB_ENUM.items()}


@jax.jit
def device_frame_scores(logits):
    """Per-frame (confidence, class) = row-wise (max, argmax) on device.

    Matches ``torch.max(scores, dim=1)`` (segmentation.py:37) including
    first-index tie-breaking.  Run this on-device so the host only receives
    2 x [N] instead of [N, C] logits.
    """
    return jnp.max(logits, axis=1), jnp.argmax(logits, axis=1).astype(jnp.int32)


def device_segment_reduce(conf, pred, max_segments: int):
    """Full RLE on device with a static segment bound — overflow-checked.

    The safe default export: runs :func:`device_segment_reduce_unchecked`
    and then fetches ``num_segments`` (one scalar host sync) to verify it
    fits the ``max_segments`` bound, raising ``ValueError`` on overflow
    instead of silently returning a truncated table (segment ids past the
    bound are dropped by the underlying segment reductions — a caller
    that missed the old "CALLER MUST CHECK" contract would corrupt its
    output with no error).  Fused jit pipelines that cannot afford the
    sync — and do their own bound check, like
    device_glue.smooth_logits — call the unchecked kernel directly.
    """
    out = device_segment_reduce_unchecked(conf, pred, max_segments)
    num_segments = int(out[0])
    if num_segments > max_segments:
        raise ValueError(
            f"device_segment_reduce overflow: {num_segments} segments "
            f"exceed max_segments={max_segments}; rows past the bound "
            "would be silently dropped. Raise max_segments (a power-of-"
            "two bucket keeps compilations shared across videos).")
    return out


def device_segment_reduce_unchecked(conf, pred, max_segments: int):
    """Raw jit-compatible RLE kernel (no host sync, no overflow check).

    Returns ``(num_segments, start_frames, end_frames, frame_types,
    run_lengths, score_means)`` where arrays are padded to ``max_segments``
    rows; rows >= num_segments are padding.  Useful when the whole pipeline
    (classify -> segment) should stay on device; the host-side table
    construction in ``Segmentation`` is otherwise equivalent.

    CALLER MUST CHECK ``num_segments <= max_segments``: segment ids past
    the bound are silently dropped by the segment reductions (a jit
    constraint — the check needs a host fetch, which this function
    cannot do without forcing synchronization; device_glue.smooth_logits
    does exactly that check and raises, and the checked
    :func:`device_segment_reduce` wrapper is the default export).
    ``run_lengths`` come back as int32 under the default x64-disabled
    config (the astype is a no-op there); host-side consumers needing
    the reference's int64 dtype convert after fetching.
    """
    n = conf.shape[0]
    boundary = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), (pred[1:] != pred[:-1]).astype(jnp.int32)]
    )
    seg_id = jnp.cumsum(boundary)
    num_segments = seg_id[-1] + 1
    ones = jnp.ones_like(conf)
    counts = jax.ops.segment_sum(ones, seg_id, num_segments=max_segments)
    sums = jax.ops.segment_sum(conf, seg_id, num_segments=max_segments)
    idx = jnp.arange(n)
    starts = jax.ops.segment_min(idx, seg_id, num_segments=max_segments)
    ends = jax.ops.segment_max(idx, seg_id, num_segments=max_segments)
    types = jax.ops.segment_max(pred, seg_id, num_segments=max_segments)
    means = sums / jnp.maximum(counts, 1)
    return num_segments, starts, ends, types, counts.astype(jnp.int64), means


def _native_available() -> bool:
    try:
        from cut_detection_tpu import native

        return native.available()
    except Exception:  # pragma: no cover - defensive
        return False


def _host_frame_scores(scores: np.ndarray):
    conf = np.max(scores, axis=1).astype(np.float32)
    pred = np.argmax(scores, axis=1).astype(np.int64)
    return conf, pred


class Segmentation:
    """Segment table built from per-frame scores (segmentation.py:26-60).

    ``scores`` may be a [N, C] array of logits (host or device) — matching
    the reference constructor — or the table can be built straight from
    per-frame (confidence, class) vectors via ``from_frame_scores`` when the
    reduction already happened on device.

    The table ``self.te`` uses the reference's exact keys and dtypes:
    ``end_frames``/``start_frames``/``run_lengths`` int64, ``frame_types``
    int64, ``score_means`` float32.
    """

    def __init__(self, scores=None, *, _te: dict | None = None):
        if _te is not None:
            self.te = _te
            return
        if scores is None:
            raise ValueError("Segmentation requires scores (or _te).")
        if isinstance(scores, jax.Array):
            conf, pred = device_frame_scores(scores)
            conf = np.asarray(jax.device_get(conf), dtype=np.float32)
            pred = np.asarray(jax.device_get(pred), dtype=np.int64)
        else:
            conf, pred = _host_frame_scores(np.asarray(scores))
        self.te = self._build_table(conf, pred)

    @classmethod
    def from_frame_scores(cls, conf, pred) -> "Segmentation":
        conf = np.asarray(conf, dtype=np.float32)
        pred = np.asarray(pred, dtype=np.int64)
        return cls(_te=cls._build_table(conf, pred))

    @staticmethod
    def _build_table(conf: np.ndarray, pred: np.ndarray) -> dict:
        n = pred.shape[0]
        # Boundaries: segment ends where the class changes; final frame
        # always closes a segment (segmentation.py:39-45).
        change = np.nonzero(pred[1:] != pred[:-1])[0]
        end_frames = np.concatenate([change, [n - 1]]).astype(np.int64)
        start_frames = np.concatenate([[0], end_frames[:-1] + 1]).astype(np.int64)
        run_lengths = np.concatenate(
            [[end_frames[0] + 1], end_frames[1:] - end_frames[:-1]]
        ).astype(np.int64)
        # Segment score means in float32 (replaces the reference's Python
        # loop at segmentation.py:54-59 with one reduceat).
        sums = np.add.reduceat(conf, start_frames.astype(np.intp))
        score_means = (sums / run_lengths.astype(np.float32)).astype(np.float32)
        return {
            "end_frames": end_frames,
            "frame_types": pred[end_frames],
            "run_lengths": run_lengths,
            "start_frames": start_frames,
            "score_means": score_means,
        }

    def __len__(self) -> int:
        return int(self.te["end_frames"].shape[0])

    def glue_orphans(self, real_threshold: int = 100,
                     blank_threshold: int = 10, *,
                     bug_compat: bool = True,
                     backend: str = "auto") -> None:
        """Merge orphan segments (segmentation.py:91-166 semantics).

        ``backend``: "auto" uses the native C++ merge loop when built
        (parity-pinned in tests/test_native.py), "python" forces the
        numpy reference-semantics implementation.
        """
        if backend == "auto" and _native_available():
            from cut_detection_tpu import native

            self.te = native.glue_orphans(self.te, real_threshold,
                                          blank_threshold,
                                          bug_compat=bug_compat)
        else:
            self.te = _glue.glue_orphans(
                self.te, real_threshold, blank_threshold,
                bug_compat=bug_compat
            )

    def combine_adjacent_segments(self, *, bug_compat: bool = True,
                                  backend: str = "auto") -> None:
        """Merge equal-type adjacent segments (segmentation.py:168-183)."""
        if backend == "auto" and _native_available():
            from cut_detection_tpu import native

            self.te = native.combine_adjacent(self.te, bug_compat=bug_compat)
        else:
            self.te = _glue.combine_adjacent_segments(
                self.te, bug_compat=bug_compat)

    def write_csv(self, file_path: str) -> None:
        """Byte-exact CSV output (segmentation.py:185-196)."""
        labels = [INVERSE_LAB_ENUM[int(t)] for t in self.te["frame_types"]]
        write_segments_csv(file_path, self.te["start_frames"], labels)
