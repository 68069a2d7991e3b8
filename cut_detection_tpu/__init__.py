"""cut_detection_tpu — a TPU-native rebuild of play4honor/Cut-Detection.

The reference (``/root/reference``) is a PyTorch/OpenCV pipeline that classifies
every frame of an NFL broadcast with a small CNN (classes ``a22``/``ez``/``b``),
run-length-encodes the per-frame argmax into segments, merges short "orphan"
segments into neighbors, and writes a ``start_frame,label`` CSV
(reference: segment_video.py:20-77, frameID/segmentation.py:26-196).

This package re-designs that pipeline TPU-first:

- ``ops``            XLA/Pallas compute primitives (NHWC conv, pooling, batch
                     norm, fused uint8 preprocess) with exact torch semantics.
- ``models``         pure-functional model definitions (param pytrees, jit-able
                     apply functions) mirroring frameID/net.py behavior.
- ``segmentation``   device-side run-length encoding plus a host-side orphan
                     gluing pass that reproduces the reference's observable
                     merge order bit-for-bit (frameID/segmentation.py).
- ``data``           streaming + chunk-parallel video decode, frame datasets.
- ``parallel``       jax.sharding mesh utilities; data/model-parallel steps.
- ``train``          optax training loops (supervised + SimCLR contrastive)
                     with on-device augmentation.
- ``checkpoint``     torch-checkpoint conversion and native npz/orbax formats.
- ``cli``            drop-in command line tools (segment_video, split_video,
                     training entry points).

Import surface mirrors the reference's ``frameID`` package:
``load_default_net`` / ``load_and_glue_nets`` (frameID/net.py:193-233),
``Segmentation`` (frameID/segmentation.py:26), ``open_video`` /
``VideoDataset`` (frameID/data.py:13-234).
"""

from cut_detection_tpu.version import __version__

from cut_detection_tpu.models.assembly import (
    load_and_glue_nets,
    load_default_net,
    load_embedding_net,
    load_triplet_or_default,
)
from cut_detection_tpu.pipeline import (
    classify_video,
    segment_many,
    segment_video_file,
)
from cut_detection_tpu.segmentation.rle import Segmentation

__all__ = [
    "__version__",
    "load_and_glue_nets",
    "load_default_net",
    "load_embedding_net",
    "load_triplet_or_default",
    "classify_video",
    "segment_many",
    "segment_video_file",
    "Segmentation",
]
