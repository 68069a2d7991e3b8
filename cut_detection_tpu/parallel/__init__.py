"""Multi-device scaling via jax.sharding meshes.

The reference has no distributed code at all (SURVEY.md §2.3); parallelism
here is first-class: the frame axis is embarrassingly parallel through the
CNN, so inference shards batches over a 1-D ``data`` mesh, and training is
data-parallel with optional tensor-parallel sharding of the hidden channel
dimension over a ``model`` axis (demonstrative for this 68K-param model,
but the layer exists so a bigger backbone scales without restructuring).
"""

from cut_detection_tpu.parallel.mesh import make_mesh, mesh_shape_for
from cut_detection_tpu.parallel.sharding import (
    batch_sharding,
    replicate,
    shard_batch,
    model_param_specs,
    make_sharded_classify_step,
)

__all__ = [
    "make_mesh",
    "mesh_shape_for",
    "batch_sharding",
    "replicate",
    "shard_batch",
    "model_param_specs",
    "make_sharded_classify_step",
]
