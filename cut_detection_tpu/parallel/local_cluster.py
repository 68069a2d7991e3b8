"""Local multi-process cluster bring-up (pod story, executed for real).

The reference has no distributed code at all (SURVEY.md §2.3); the pod
design here is: every host runs the same SPMD program, ``jax.distributed``
wires the processes into one runtime, the GSPMD programs in
``parallel/sharding.py`` shard over the *global* device set, and host-side
work (video decode) is partitioned per host so only logits/gradients cross
hosts (``distributed.partition_inputs``).

This module makes that path executable WITHOUT a multi-host pod: N local
processes, each given ``devices_per_process`` virtual CPU devices
(``--xla_force_host_platform_device_count``), form a real 2+-process
jax.distributed cluster over localhost.  ``run_worker`` then proves the
cluster works end to end:

1. ``jax.process_count() / device_count()`` span the cluster;
2. a cross-process collective reduces per-process-distinct data (the
   result is checkable only if DCN communication really happened);
3. the FULL sharded supervised train step runs over the global mesh
   (gradients psum across processes, sync-BN over the global batch);
4. ``partition_inputs`` gives each process its round-robin video shard.

Run a 2-process smoke cluster by hand:

    python -m cut_detection_tpu.parallel.local_cluster --spawn 2

or one worker per terminal:

    python -m cut_detection_tpu.parallel.local_cluster \
        --process-id 0 --num-processes 2 --coordinator localhost:9911
"""

from __future__ import annotations

import argparse
import os
import sys


def _configure_process(devices_per_process: int) -> None:
    """Force the CPU platform with N virtual devices (before jax import)."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" in flags:
        # An inherited count that disagrees with devices_per_process
        # would only surface later as an opaque local_device_count
        # assertion; rewrite it to the requested value.
        import re

        flags = re.sub(r"--xla_force_host_platform_device_count=\d+",
                       f"--xla_force_host_platform_device_count="
                       f"{devices_per_process}", flags)
        os.environ["XLA_FLAGS"] = flags
    else:
        os.environ["XLA_FLAGS"] = (
            f"{flags} --xla_force_host_platform_device_count="
            f"{devices_per_process}").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")


def run_worker(process_id: int, num_processes: int, coordinator: str,
               devices_per_process: int = 4) -> None:
    """One SPMD worker; raises on any cluster-correctness failure."""
    _configure_process(devices_per_process)
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cut_detection_tpu.parallel.distributed import (
        initialize,
        partition_inputs,
    )

    pid = initialize(coordinator_address=coordinator,
                     num_processes=num_processes, process_id=process_id)
    assert pid == process_id
    assert jax.process_count() == num_processes, jax.process_count()
    n_global = num_processes * devices_per_process
    assert jax.device_count() == n_global, jax.device_count()
    assert jax.local_device_count() == devices_per_process

    from cut_detection_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(jax.devices(), model_parallel=1)

    # --- cross-process collective with per-process-distinct data: the
    # reduced value is only right if bytes really crossed processes. ---
    sharding = NamedSharding(mesh, P("data"))
    local = np.full((devices_per_process, 8), float(process_id + 1),
                    np.float32)
    global_x = jax.make_array_from_process_local_data(sharding, local)
    total = jax.jit(lambda x: jnp.sum(x),
                    out_shardings=NamedSharding(mesh, P()))(global_x)
    expect = 8.0 * devices_per_process * sum(
        p + 1 for p in range(num_processes))
    got = float(total)
    assert got == expect, (got, expect)

    # --- the full sharded supervised train step over the global mesh ---
    from cut_detection_tpu.config import TrainConfig
    from cut_detection_tpu.parallel.sharding import replicate, shard_batch
    from cut_detection_tpu.train.supervised import init_train_state, jit_steps

    cfg = TrainConfig(conv_hidden_channels=8, conv_layers=2, avg_pool_size=2,
                      linear_layers=2, linear_size=8, output_size=3,
                      batch_size=2 * n_global, epochs=1)
    train_step, eval_step, _ = jit_steps(cfg, mesh)
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    state = replicate(mesh, state)
    rng = np.random.default_rng(0)  # same stream on every process (SPMD)
    x = rng.integers(0, 255, size=(cfg.batch_size, 27, 48, 3), dtype=np.uint8)
    y = rng.integers(0, 3, size=(cfg.batch_size,)).astype(np.int64)
    state, metrics = train_step(state, shard_batch(mesh, x),
                                shard_batch(mesh, y))
    loss = float(metrics["loss"])  # replicated output: readable everywhere
    assert np.isfinite(loss)

    # --- per-host work partitioning ---
    videos = [f"game_{i}.mp4" for i in range(2 * num_processes + 1)]
    mine = partition_inputs(videos)
    assert mine == videos[process_id::num_processes]

    print(f"WORKER-OK pid={pid} loss={loss:.4f} videos={mine}", flush=True)


def spawn_cluster(num_processes: int, devices_per_process: int = 4,
                  timeout: float = 600.0) -> list[str]:
    """Spawn N worker subprocesses over localhost; return their stdouts.

    Raises RuntimeError if any worker fails.  Used by the test suite to
    execute the multi-process path for real on a single machine.
    """
    import socket
    import subprocess

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coordinator = f"localhost:{port}"

    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    env = dict(os.environ)
    # Clean slate: no axon sitecustomize (PYTHONPATH) or inherited platform
    # pins; each worker configures its own CPU platform.
    env["PYTHONPATH"] = repo_root
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"

    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "cut_detection_tpu.parallel.local_cluster",
             "--process-id", str(p), "--num-processes", str(num_processes),
             "--coordinator", coordinator,
             "--devices-per-process", str(devices_per_process)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=repo_root)
        for p in range(num_processes)
    ]
    outs = []
    failed = []
    for p, proc in enumerate(procs):
        try:
            out, _ = proc.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            proc.kill()
            out, _ = proc.communicate()
            failed.append((p, "timeout", out))
            continue
        outs.append(out)
        if proc.returncode != 0 or "WORKER-OK" not in out:
            failed.append((p, proc.returncode, out))
    if failed:
        detail = "\n".join(f"worker {p} rc={rc}:\n{out[-2000:]}"
                           for p, rc, out in failed)
        raise RuntimeError(f"local cluster failed:\n{detail}")
    return outs


def main(args=None) -> None:
    ap = argparse.ArgumentParser(
        "Local multi-process jax.distributed cluster (CPU devices).")
    ap.add_argument("--spawn", type=int, default=None, metavar="N",
                    help="Spawn an N-process cluster and run all workers.")
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--coordinator", type=str, default="localhost:9911")
    ap.add_argument("--devices-per-process", type=int, default=4)
    ns = ap.parse_args(args)
    if ns.spawn is not None:
        for out in spawn_cluster(ns.spawn, ns.devices_per_process):
            print(out, end="")
        return
    if ns.process_id is None:
        ap.error("--process-id is required when not using --spawn")
    run_worker(ns.process_id, ns.num_processes, ns.coordinator,
               ns.devices_per_process)


if __name__ == "__main__":
    main()
