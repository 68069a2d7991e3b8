"""Persistent XLA compilation cache setup.

First-compile latency dominates short CLI runs (the 68K-param classifier
itself runs in microseconds).  Enabling JAX's persistent compilation cache
makes every invocation after the first start hot.  Opt out with
``CUTDET_NO_COMPILE_CACHE=1`` or override the location with
``CUTDET_COMPILE_CACHE_DIR``.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "cut_detection_tpu", "xla_cache"
)


def enable_compilation_cache() -> str | None:
    """Enable the persistent compilation cache; returns the dir (or None)."""
    if os.environ.get("CUTDET_NO_COMPILE_CACHE") == "1":
        return None
    cache_dir = os.environ.get("CUTDET_COMPILE_CACHE_DIR", _DEFAULT_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Cache everything, even fast compiles: CLI processes are short-lived.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
