"""Multi-host (pod) initialization scaffolding.

Single-host multi-chip scaling is fully covered by the mesh layer
(parallel/mesh.py); this module holds the pod-scale entry point
(docs/ROADMAP.md #1).  On a multi-host TPU pod every host runs the same
program; ``initialize()`` wires up the jax.distributed runtime so
``jax.devices()`` spans the pod and the GSPMD programs in
parallel/sharding.py shard globally with zero further changes — the
collectives ride ICI within a slice exactly as in the single-host case.

Host-side work partitioning for the video pipeline: each host decodes its
own shard of the video list (``partition_inputs``) so only gradients /
logits ever cross hosts, never frames.

Multi-host TPU hardware is not available in this environment, but the
multi-process path itself IS executed for real: parallel/local_cluster.py
spawns a 2-process jax.distributed cluster over localhost (4 virtual CPU
devices each) and runs a cross-process collective, the sharded train step
and ``partition_inputs`` inside it (tests/test_distributed.py).
"""

from __future__ import annotations

import logging

logger = logging.getLogger(__name__)

_initialized = False


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> int:
    """Initialize the distributed runtime; returns this host's process id.

    With no arguments, environment-based auto-configuration is used on
    TPU pods (the standard jax.distributed behavior); in a plain
    single-process environment this degrades to a no-op returning 0.
    """
    global _initialized
    import jax

    if _initialized:
        return jax.process_index()
    if coordinator_address is None and num_processes in (None, 1):
        # No explicit cluster: ATTEMPT the environment auto-configuration
        # (the standard jax.distributed behavior on TPU pods).  Skipping
        # it would leave process_count()==1 on every pod host, so each
        # would process the FULL work list (duplicated work, clobbered
        # outputs).  Off-pod the attempt raises and we degrade to the
        # single-process no-op — returning jax.process_index(), not a
        # hardcoded 0, in case a backend already knows its topology.
        try:
            from cut_detection_tpu.utils.platform import bounded_call

            # Bounded: cluster detection can touch metadata services
            # that HANG off-pod rather than raise.
            bounded_call(jax.distributed.initialize, 120.0,
                         "distributed auto-config")
            logger.info("distributed: auto-configured from environment")
        except Exception as e:  # noqa: BLE001 — no cluster env: single proc
            logger.debug("distributed auto-config unavailable (%s); "
                         "running single-process", e)
        _initialized = True
        return jax.process_index()
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    _initialized = True
    logger.info("distributed: process %d of %d, %d local / %d global devices",
                jax.process_index(), jax.process_count(),
                jax.local_device_count(), jax.device_count())
    return jax.process_index()


def partition_inputs(items: list, *, process_id: int | None = None,
                     num_processes: int | None = None) -> list:
    """This host's shard of a work list (videos, frame dirs, ...).

    Round-robin so long/short videos spread evenly across hosts.
    """
    import jax

    pid = jax.process_index() if process_id is None else process_id
    n = jax.process_count() if num_processes is None else num_processes
    return [it for i, it in enumerate(items) if i % n == pid]
