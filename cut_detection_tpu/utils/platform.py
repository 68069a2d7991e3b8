"""Platform selection helper.

Forcing CPU needs BOTH the config flag and the env var: parts of JAX (the
profiler server, late backend discovery) read ``JAX_PLATFORMS`` from the
environment directly, and the deployment image pins it to a TPU plugin.
"""

from __future__ import annotations

import os


def force_cpu() -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
