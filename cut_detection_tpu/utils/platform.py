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
    return bounded_call(jax.devices, timeout, "JAX backend init")


def bounded_call(fn, timeout: float, what: str):
    """Run ``fn()`` on a daemon thread, bounded in wall-clock time.

    The shared primitive behind every hang bound in the repo (backend
    init here, bench.py's per-stage bounds): a wedged device tunnel
    HANGS calls rather than raising, which no exception handler can
    catch.  Returns ``fn()``'s value; re-raises its exception; raises
    ``TimeoutError`` (message carries the DEADLINE marker the bench's
    transient classifier matches) when the call outlives ``timeout``.
    The abandoned thread is left to the OS — it may pin a stale tunnel
    claim until it clears, which is still strictly better than the
    caller hanging forever.
    """
    import threading

    out: list = []
    err: list = []

    def work():
        try:
            out.append(fn())
        except BaseException as e:  # noqa: BLE001 — surface any fault
            err.append(e)

    t = threading.Thread(target=work, daemon=True, name=f"bounded-{what}")
    t.start()
    t.join(timeout)
    if err:
        raise err[0]
    if not out:
        raise TimeoutError(
            f"DEADLINE: {what} did not complete within {timeout:.0f}s "
            "(wedged tunnel?)")
    return out[0]
