"""XLA/Pallas compute primitives for the frame classifier.

Everything here operates in NHWC layout (TPU-native; channels land on the
128-lane dimension) while reproducing the numerical semantics of the torch
NCHW modules used by the reference (frameID/net.py).
"""

from cut_detection_tpu.ops.nn import (
    conv2d_same,
    max_pool,
    adaptive_avg_pool,
    adaptive_pool_matrices,
    batch_norm_infer,
    batch_norm_train,
    linear,
)
from cut_detection_tpu.ops.preprocess import (
    normalize_frames,
    preprocess_u8_batch,
)
from cut_detection_tpu.ops.resize import (
    resize_bilinear,
    resize_width_like_reference,
    reference_resize_dims,
)

__all__ = [
    "conv2d_same",
    "max_pool",
    "adaptive_avg_pool",
    "adaptive_pool_matrices",
    "batch_norm_infer",
    "batch_norm_train",
    "linear",
    "normalize_frames",
    "preprocess_u8_batch",
    "resize_bilinear",
    "resize_width_like_reference",
    "reference_resize_dims",
]
