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


def init_devices(default_timeout: float | None = None):
    """``jax.devices()`` bounded by ``CUTDET_INIT_TIMEOUT`` seconds.

    A wedged device tunnel can make backend init HANG forever without
    raising (observed live: >2 h stuck), which no exception handler can
    catch.  When a timeout applies (the env var, or ``default_timeout``
    for daemons), init runs on a daemon thread and a ``TimeoutError``
    surfaces instead — batch jobs and supervisors get a clear failure
    they can retry.  With neither set, behaves exactly like
    ``jax.devices()`` (interactive use keeps its unbounded default).
    """
    import jax

    try:
        timeout = float(os.environ.get("CUTDET_INIT_TIMEOUT") or
                        default_timeout or 0)
    except ValueError:
        # A malformed override (CUTDET_INIT_TIMEOUT=abc) must not crash
        # every CLI at startup; fall back to the caller's default.
        timeout = float(default_timeout or 0)
    if timeout <= 0:
        return jax.devices()
    import threading

    devices: list = []
    error: list = []

    def init():
        try:
            devices.append(jax.devices())
        except BaseException as e:  # noqa: BLE001 — surface init faults
            error.append(e)

    t = threading.Thread(target=init, daemon=True)
    t.start()
    t.join(timeout)
    if error:
        raise error[0]
    if not devices:
        raise TimeoutError(
            f"JAX backend init did not complete within {timeout:.0f}s "
            "(wedged tunnel?)")
    return devices[0]
