"""Pure-functional model definitions (param/state pytrees + apply fns)."""

from cut_detection_tpu.models.frame_conv import (
    init_frame_conv,
    init_frame_linear,
    apply_frame_conv,
    apply_frame_linear,
    num_params,
)
from cut_detection_tpu.models.assembly import (
    GluedNet,
    load_and_glue_nets,
    load_default_net,
)

__all__ = [
    "init_frame_conv",
    "init_frame_linear",
    "apply_frame_conv",
    "apply_frame_linear",
    "num_params",
    "GluedNet",
    "load_and_glue_nets",
    "load_default_net",
]
