"""Pallas TPU kernels for the hot ops."""

from cut_detection_tpu.ops.pallas.preprocess_kernel import (
    fused_resize_normalize,
)

__all__ = ["fused_resize_normalize"]
