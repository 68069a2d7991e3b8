"""flax.linen mirrors of the functional models (ecosystem interop).

The core models are pure (init, apply) pairs over explicit pytrees
(models/frame_conv.py) — the leanest form for jit/shard_map.  Teams living
in the flax ecosystem get the same networks as ``nn.Module``s here; the
modules delegate to the exact same op implementations, and
``bundle_to_variables`` / ``variables_to_bundle`` convert losslessly
between a GluedNet bundle and flax variable collections (``params`` +
``batch_stats``), so checkpoints flow freely in both directions.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from cut_detection_tpu.config import ConvNetConfig, LinearNetConfig, ModelParams
from cut_detection_tpu.models.frame_conv import (
    apply_frame_conv,
    apply_frame_linear,
    init_frame_conv,
    init_frame_linear,
)


class FrameConvNet(nn.Module):
    """linen mirror of the conv backbone (frameID/net.py:71-136 semantics)."""

    cfg: ConvNetConfig = ConvNetConfig()

    @nn.compact
    def __call__(self, x, train: bool = False):
        def init_params(rng):
            params, _ = init_frame_conv(rng, self.cfg)
            return params

        def init_state(rng):
            _, state = init_frame_conv(rng, self.cfg)
            return state

        params = self.param("layers", init_params)
        state_var = self.variable("batch_stats", "layers", init_state,
                                  self.make_rng("params")
                                  if self.is_initializing() else None)
        y, new_state = apply_frame_conv(params, state_var.value, x, self.cfg,
                                        train=train)
        if train and not self.is_initializing():
            state_var.value = new_state
        return y


class FrameLinearNet(nn.Module):
    """linen mirror of the FC head (frameID/net.py:139-189 semantics)."""

    cfg: LinearNetConfig = LinearNetConfig()

    @nn.compact
    def __call__(self, x, train: bool = False):
        def init_params(rng):
            params, _ = init_frame_linear(rng, self.cfg)
            return params

        def init_state(rng):
            _, state = init_frame_linear(rng, self.cfg)
            return state

        params = self.param("layers", init_params)
        state_var = self.variable("batch_stats", "layers", init_state,
                                  self.make_rng("params")
                                  if self.is_initializing() else None)
        y, new_state = apply_frame_linear(params, state_var.value, x,
                                          self.cfg, train=train)
        if train and not self.is_initializing():
            state_var.value = new_state
        return y


class GluedClassifier(nn.Module):
    """Conv backbone + FC head, the ``load_and_glue_nets`` shape."""

    model_params: ModelParams = ModelParams()

    def setup(self):
        self.conv = FrameConvNet(self.model_params.conv_config())
        self.linear = FrameLinearNet(self.model_params.linear_config())

    def __call__(self, x, train: bool = False):
        return self.linear(self.conv(x, train=train), train=train)


def bundle_to_variables(bundle) -> dict[str, Any]:
    """GluedNet bundle -> flax variables for ``GluedClassifier``."""
    as_jnp = lambda tree: [  # noqa: E731
        {k: jnp.asarray(v) for k, v in layer.items()} for layer in tree
    ]
    return {
        "params": {"conv": {"layers": as_jnp(bundle["conv"]["params"])},
                   "linear": {"layers": as_jnp(bundle["linear"]["params"])}},
        "batch_stats": {"conv": {"layers": as_jnp(bundle["conv"]["state"])},
                        "linear": {"layers": as_jnp(bundle["linear"]["state"])}},
    }


def variables_to_bundle(variables) -> dict[str, Any]:
    """flax variables -> GluedNet bundle (inverse of bundle_to_variables)."""
    return {
        "conv": {"params": variables["params"]["conv"]["layers"],
                 "state": variables["batch_stats"]["conv"]["layers"]},
        "linear": {"params": variables["params"]["linear"]["layers"],
                   "state": variables["batch_stats"]["linear"]["layers"]},
    }
