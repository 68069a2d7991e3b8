"""Data layer: video decode, frame datasets, batching/prefetch."""

from cut_detection_tpu.data.video import (
    open_video,
    VideoDataset,
    VideoFrameSource,
    ParallelVideoReader,
    batch_frames,
)
from cut_detection_tpu.data.frames import (
    ContrastiveFrameDataset,
    SupervisedFrameDataset,
)
from cut_detection_tpu.data.loader import PrefetchLoader, iter_batches

__all__ = [
    "open_video",
    "VideoDataset",
    "VideoFrameSource",
    "ParallelVideoReader",
    "batch_frames",
    "ContrastiveFrameDataset",
    "SupervisedFrameDataset",
    "PrefetchLoader",
    "iter_batches",
]
