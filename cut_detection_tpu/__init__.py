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

# Lazy re-exports (PEP 562): the eager imports here used to pull the
# whole model/pipeline stack — and therefore jax (~1.5 s) — into EVERY
# process that touches any submodule, including the decode SUBPROCESS
# (data/shm_loader.py) that only needs cv2+numpy.  Submodule imports run
# this file first, so it must stay dependency-free; attribute access
# (``cut_detection_tpu.classify_video``) resolves on demand.
_LAZY = {
    "load_and_glue_nets": "cut_detection_tpu.models.assembly",
    "load_default_net": "cut_detection_tpu.models.assembly",
    "load_embedding_net": "cut_detection_tpu.models.assembly",
    "load_triplet_or_default": "cut_detection_tpu.models.assembly",
    "classify_video": "cut_detection_tpu.pipeline",
    "segment_many": "cut_detection_tpu.pipeline",
    "segment_video_file": "cut_detection_tpu.pipeline",
    "Segmentation": "cut_detection_tpu.segmentation.rle",
}

__all__ = ["__version__", *_LAZY]


def __getattr__(name: str):
    mod = _LAZY.get(name)
    if mod is None:
        raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
    import importlib

    return getattr(importlib.import_module(mod), name)


def __dir__():
    return sorted(set(globals()) | set(_LAZY))
