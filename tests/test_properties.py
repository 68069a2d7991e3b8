"""Property-based tests (hypothesis) for the segmentation core.

Invariants that must hold for ANY per-frame score input, any thresholds —
hypothesis searches the space and shrinks failures to minimal cases.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from tests.conftest import import_reference, reference_available

from cut_detection_tpu.segmentation.glue import find_orphans
from cut_detection_tpu.segmentation.rle import Segmentation


@st.composite
def score_arrays(draw, max_frames=400, allow_ties=True):
    n = draw(st.integers(min_value=1, max_value=max_frames))
    seed = draw(st.integers(min_value=0, max_value=2**31 - 1))
    scale = draw(st.integers(min_value=1, max_value=50))
    quantized = allow_ties and draw(st.booleans())
    rng = np.random.default_rng(seed)
    labels = []
    while sum(len(s) for s in labels) < n:
        labels.append(np.full(int(rng.integers(1, scale + 1)),
                              rng.integers(0, 3)))
    lab = np.concatenate(labels)[:n]
    if quantized:
        scores = (rng.integers(0, 6, size=(n, 3)) / 2.0).astype(np.float32)
    else:
        scores = rng.normal(0, 1, size=(n, 3)).astype(np.float32)
    scores[np.arange(n), lab] += 2.0
    return scores


def _check_partition(te, n):
    starts = te["start_frames"]
    ends = te["end_frames"]
    assert starts[0] == 0
    assert ends[-1] == n - 1
    np.testing.assert_array_equal(starts[1:], ends[:-1] + 1)
    np.testing.assert_array_equal(te["run_lengths"], ends - starts + 1)
    assert set(np.unique(te["frame_types"])) <= {0, 1, 2}


@settings(max_examples=40, deadline=None, derandomize=True)
@given(score_arrays(), st.integers(1, 120), st.integers(1, 40))
def test_glue_invariants(scores, k1, kb):
    n = scores.shape[0]
    seg = Segmentation(scores)
    _check_partition(seg.te, n)
    seg.glue_orphans(k1, kb)
    _check_partition(seg.te, n)
    # Post-glue: no orphans remain unless only one segment is left.
    mask = find_orphans(seg.te["frame_types"], seg.te["run_lengths"], k1, kb)
    assert len(seg) == 1 or not mask.any()
    seg.combine_adjacent_segments()
    _check_partition(seg.te, n)
    # Post-merge: no equal-type adjacency.
    t = seg.te["frame_types"]
    assert not (t[1:] == t[:-1]).any()


@reference_available
@settings(max_examples=25, deadline=None, derandomize=True)
@given(score_arrays(max_frames=250, allow_ties=False),
       st.integers(1, 100), st.integers(1, 30))
def test_glue_matches_reference_property(torch, scores, k1, kb):
    """Parity holds for any tie-free input.

    Inputs with EXACT score-mean ties are excluded: the reference breaks
    ties with ``torch.argsort(...)[0]`` and torch's sort is unstable, so
    its merge order on exact ties is implementation-defined (hypothesis
    found adversarial tie-heavy cases where torch picks a non-first
    index).  Real logits are continuous, making exact ties measure-zero;
    see segmentation/glue.py's docstring for the documented caveat.
    """
    seg_mod = import_reference("frameID.segmentation")
    ours = Segmentation(scores)
    ref = seg_mod.Segmentation(torch.from_numpy(scores))
    # The reference raises when a lone surviving segment is an orphan
    # (its first-element branch indexes out of range); our guard stops
    # instead, so only compare when the reference completes.
    try:
        ref.glue_orphans(k1, kb)
        ref.combine_adjacent_segments()
    except (IndexError, RuntimeError):
        return
    ours.glue_orphans(k1, kb)
    ours.combine_adjacent_segments()
    np.testing.assert_array_equal(ours.te["start_frames"],
                                  ref.te["start_frames"].numpy())
    np.testing.assert_array_equal(ours.te["frame_types"],
                                  ref.te["frame_types"].numpy())
