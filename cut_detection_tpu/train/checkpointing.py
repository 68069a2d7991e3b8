"""Training checkpoint/resume.

The reference saves only once, after the last epoch, with no optimizer
state and no resume path (supervised_training.py:217-245 — "We don't have
any fancy way to save checkpoints").  Here:

- ``save_train_state`` snapshots the FULL state (params, BN stats,
  optimizer moments, step) every N epochs; ``load_train_state`` restores
  into a freshly-initialized state's structure, so optax pytrees (arbitrary
  NamedTuples) round-trip exactly.
- ``save_model_triplet`` writes the reference's artifact contract: conv +
  linear checkpoint files plus the ``*_model_params.json`` sidecar
  (supervised_training.py:224-245), in native npz form, with optional
  torch ``.pt`` export for interop.
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np

from cut_detection_tpu.checkpoint.io import load_bundle, save_bundle
from cut_detection_tpu.config import TrainConfig


def save_train_state(directory: str, state, cfg, epoch: int) -> str:
    """Write a full-state snapshot; returns the checkpoint path."""
    os.makedirs(directory, exist_ok=True)
    leaves = jax.tree_util.tree_leaves(state)
    flat = {f"leaf_{i:04d}": np.asarray(jax.device_get(l))
            for i, l in enumerate(leaves)}
    path = os.path.join(directory, f"train_state_{epoch:04d}.npz")
    np.savez(path, **flat)
    meta = {"epoch": epoch, "n_leaves": len(leaves)}
    with open(os.path.join(directory, "train_state_meta.json"), "w") as f:
        json.dump(meta, f)
    return path


def latest_checkpoint(directory: str) -> str | None:
    if not os.path.isdir(directory):
        return None
    snaps = sorted(f for f in os.listdir(directory)
                   if f.startswith("train_state_") and f.endswith(".npz"))
    return os.path.join(directory, snaps[-1]) if snaps else None


def load_train_state(path: str, template_state):
    """Restore a snapshot into the structure of ``template_state``."""
    with np.load(path) as data:
        leaves = [data[f"leaf_{i:04d}"] for i in range(len(data.files))]
    treedef = jax.tree_util.tree_structure(template_state)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_model_triplet(model_dir: str, model_name: str, state,
                       cfg: TrainConfig, *, export_torch: bool = False) -> None:
    """Reference save contract (supervised_training.py:224-245):

    ``{name}_classifier_conv.npz`` + ``{name}_classifier_linear.npz`` +
    ``{name}_model_params.json`` (same JSON keys).  With ``export_torch``
    also writes ``.pt`` state dicts loadable by the torch reference.
    """
    os.makedirs(model_dir, exist_ok=True)
    state = jax.device_get(state)
    conv = {"params": state["params"]["conv"],
            "state": state["bn_state"]["conv"]}
    linear = {"params": state["params"]["linear"],
              "state": state["bn_state"]["linear"]}
    save_bundle(os.path.join(model_dir, f"{model_name}_classifier_conv.npz"),
                conv)
    save_bundle(os.path.join(model_dir, f"{model_name}_classifier_linear.npz"),
                linear)
    params_json = {
        "conv_layers": cfg.conv_layers,
        "conv_channels": cfg.conv_hidden_channels,
        "avg_pool_size": cfg.avg_pool_size,
        "linear_layers": cfg.linear_layers,
        "linear_size": cfg.linear_size,
        "linear_output_size": cfg.output_size,
        "data_size": cfg.data_size,
        "batch_size": cfg.batch_size,
        "epochs": cfg.epochs,
    }
    with open(os.path.join(model_dir, f"{model_name}_model_params.json"),
              "w") as f:
        json.dump(params_json, f)
    if export_torch:
        import torch

        from cut_detection_tpu.checkpoint.convert import (
            export_torch_state_dicts,
        )

        conv_sd, lin_sd = export_torch_state_dicts(
            {"conv": conv, "linear": linear})
        torch.save(conv_sd,
                   os.path.join(model_dir, f"{model_name}_classifier_conv.pt"))
        torch.save(lin_sd,
                   os.path.join(model_dir,
                                f"{model_name}_classifier_linear.pt"))


def load_model_triplet(model_dir: str, model_name: str):
    """Load a triplet saved by ``save_model_triplet`` as a GluedNet bundle."""
    conv = load_bundle(os.path.join(model_dir,
                                    f"{model_name}_classifier_conv.npz"))
    linear = load_bundle(os.path.join(model_dir,
                                      f"{model_name}_classifier_linear.npz"))
    return {"conv": conv, "linear": linear}


# --- orbax backend (optional) -------------------------------------------
#
# The npz snapshots above are dependency-free and exact; orbax adds
# async/atomic multi-host checkpointing for larger training runs.  Both
# write the same logical state.

def save_train_state_orbax(directory: str, state, epoch: int) -> str:
    """Async-capable orbax snapshot of the full train state."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(directory, f"orbax_{epoch:04d}"))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(state), force=True)
    ckptr.wait_until_finished()
    return path


def load_train_state_orbax(path: str, template_state):
    """Restore an orbax snapshot into ``template_state``'s structure."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path),
                         jax.device_get(template_state))
