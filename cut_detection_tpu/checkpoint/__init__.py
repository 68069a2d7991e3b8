"""Checkpoint I/O: native npz/orbax formats + torch checkpoint conversion."""

from cut_detection_tpu.checkpoint.io import (
    save_bundle,
    load_bundle,
    flatten_tree,
    unflatten_tree,
)

__all__ = [
    "save_bundle",
    "load_bundle",
    "flatten_tree",
    "unflatten_tree",
]
