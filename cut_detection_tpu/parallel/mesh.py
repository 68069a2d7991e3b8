"""Device mesh construction helpers."""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def mesh_shape_for(n_devices: int, model_parallel: int = 1) -> tuple[int, int]:
    """(data, model) factorization of ``n_devices``."""
    if n_devices % model_parallel != 0:
        raise ValueError(
            f"model_parallel={model_parallel} must divide n_devices={n_devices}"
        )
    return n_devices // model_parallel, model_parallel


def make_mesh(devices=None, *, model_parallel: int = 1) -> Mesh:
    """A (data[, model]) mesh over ``devices`` (default: all local devices).

    With ``model_parallel == 1`` the mesh is still 2-D with a size-1 model
    axis so sharding specs are uniform across configurations.
    """
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    data, model = mesh_shape_for(devices.size, model_parallel)
    return Mesh(devices.reshape(data, model), axis_names=("data", "model"))
