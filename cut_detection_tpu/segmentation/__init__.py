"""Run-length segmentation of per-frame class scores.

Reference: frameID/segmentation.py.  The per-frame work (argmax, boundary
detection, per-segment score means) is vectorized — on device via
``rle.device_frame_scores`` / ``rle.device_segment_reduce`` or on host via
numpy — and the data-dependent orphan-merge loop runs on host over the
(small) segment table, reproducing the reference's exact merge order.
"""

from cut_detection_tpu.segmentation.rle import (
    Segmentation,
    LAB_ENUM,
    INVERSE_LAB_ENUM,
    device_frame_scores,
    device_segment_reduce,
    device_segment_reduce_unchecked,
)
from cut_detection_tpu.segmentation.glue import (
    find_orphans,
    glue_orphans,
    combine_adjacent_segments,
)
from cut_detection_tpu.segmentation.csv_io import write_segments_csv
from cut_detection_tpu.segmentation.device_glue import (
    device_smooth,
    smooth_logits,
)

__all__ = [
    "Segmentation",
    "LAB_ENUM",
    "INVERSE_LAB_ENUM",
    "device_frame_scores",
    "device_segment_reduce",
    "device_segment_reduce_unchecked",
    "find_orphans",
    "glue_orphans",
    "combine_adjacent_segments",
    "write_segments_csv",
    "device_smooth",
    "smooth_logits",
]
