"""Supervised classifier training (analog of
training_scripts/supervised_training.py, redesigned functional/TPU-first).

Reference semantics kept: AdamW over the chained conv+linear params
(supervised_training.py:125-130), ``CrossEntropyLoss(reduction="sum")``
(:131), 75/25 randperm split (:70-76), per-class validation accuracy
(:184-215), and the ``*_model_params.json`` sidecar on save (:228-245).

TPU-first changes: one jit'd train step over explicit pytrees; the batch
shards over the mesh's ``data`` axis and XLA inserts the gradient psum
(GSPMD); batch norm uses global-batch statistics; frames cross PCIe as
uint8 and normalize on device; checkpoints are periodic and resumable
(the reference saves only once at the end, :217).
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cut_detection_tpu.config import ConvNetConfig, LinearNetConfig, TrainConfig
from cut_detection_tpu.models.frame_conv import (
    apply_frame_conv,
    apply_frame_linear,
    init_frame_conv,
    init_frame_linear,
)
from cut_detection_tpu.train.losses import cross_entropy_sum

logger = logging.getLogger(__name__)


def _train_compute_dtype(cfg) -> str | None:
    """Validate the training precision mode.

    Mixed precision for training (``compute_dtype="bfloat16"``) means
    bf16 activations through the conv/FC stack with f32 islands for the
    batch-norm statistics (ops/nn.batch_norm_train upcasts internally)
    and the loss, while parameters, gradients, and optimizer state stay
    f32.  The inference-only ``bfloat16_full`` label is rejected so the
    mode vocabularies stay distinct.
    """
    cd = getattr(cfg, "compute_dtype", None)
    if cd not in (None, "bfloat16"):
        raise ValueError(
            f"training compute_dtype must be None or 'bfloat16', got {cd!r}")
    # Internally the differentiable region must be uniformly bf16 (JAX's
    # conv/dot VJPs require cotangent dtype == operand dtype, so the
    # inference-style "bf16 operands, f32 outputs" mix cannot be
    # differentiated).  bf16 activations + the f32 islands inside
    # batch_norm_train / cross_entropy_sum = standard TPU mixed
    # precision; params, grads and optimizer state stay f32 because the
    # per-op casts' VJPs deliver f32 cotangents at the f32 leaves.
    return "bfloat16_full" if cd == "bfloat16" else None


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """AdamW with torch defaults (lr 1e-3, betas 0.9/0.999, eps 1e-8,
    weight_decay 0.01), matching ``getattr(torch.optim, "AdamW")()``
    (supervised_training.py:47,125)."""
    if cfg.optimizer.lower() != "adamw":
        return getattr(optax, cfg.optimizer.lower())(cfg.learning_rate)
    return optax.adamw(cfg.learning_rate, b1=0.9, b2=0.999, eps=1e-8,
                       weight_decay=cfg.weight_decay)


def init_train_state(key, cfg: TrainConfig, optimizer=None) -> dict:
    """Build the full training state pytree."""
    conv_cfg = ConvNetConfig(
        hidden_channels=cfg.conv_hidden_channels,
        n_conv_layers=cfg.conv_layers,
        average_pool_size=cfg.avg_pool_size,
    )
    lin_cfg = LinearNetConfig(
        n_layers=cfg.linear_layers,
        input_size=conv_cfg.feature_size,
        hidden_size=cfg.linear_size,
        output_size=cfg.output_size,
    )
    k1, k2 = jax.random.split(key)
    conv_p, conv_s = init_frame_conv(k1, conv_cfg)
    lin_p, lin_s = init_frame_linear(k2, lin_cfg)
    params = {"conv": conv_p, "linear": lin_p}
    bn_state = {"conv": conv_s, "linear": lin_s}
    optimizer = optimizer or make_optimizer(cfg)
    return {
        "params": params,
        "bn_state": bn_state,
        "opt_state": optimizer.init(params),
        "step": jnp.zeros((), jnp.int32),
    }


def make_train_step(cfg: TrainConfig, optimizer=None):
    """jit-able ``step(state, x_u8, y) -> (state, metrics)``.

    ``x_u8``: [B, H, W, 3] uint8 RGB frames; normalization (/255) happens
    on device (frames ship as uint8 — 4x less PCIe than float32).
    """
    conv_cfg = ConvNetConfig(
        hidden_channels=cfg.conv_hidden_channels,
        n_conv_layers=cfg.conv_layers,
        average_pool_size=cfg.avg_pool_size,
    )
    lin_cfg = LinearNetConfig(
        n_layers=cfg.linear_layers,
        input_size=conv_cfg.feature_size,
        hidden_size=cfg.linear_size,
        output_size=cfg.output_size,
    )
    optimizer = optimizer or make_optimizer(cfg)

    cd = _train_compute_dtype(cfg)

    def _conv_forward(conv_p, conv_s, x):
        return apply_frame_conv(conv_p, conv_s, x, conv_cfg, train=True,
                                compute_dtype=cd)

    if cfg.remat:
        # Rematerialize conv activations in the backward pass (trade FLOPs
        # for HBM residency) — a no-op for correctness.
        _conv_forward = jax.checkpoint(_conv_forward)

    def loss_fn(params, bn_state, x, y):
        feats, conv_s = _conv_forward(params["conv"], bn_state["conv"], x)
        logits, lin_s = apply_frame_linear(params["linear"],
                                           bn_state["linear"], feats,
                                           lin_cfg, train=True,
                                           compute_dtype=cd)
        loss = cross_entropy_sum(logits, y)
        return loss, ({"conv": conv_s, "linear": lin_s}, logits)

    def step(state, x_u8, y):
        x = x_u8.astype(jnp.float32) / 255.0
        (loss, (bn_state, logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state["params"], state["bn_state"], x, y)
        updates, opt_state = optimizer.update(grads, state["opt_state"],
                                              state["params"])
        params = optax.apply_updates(state["params"], updates)
        correct = jnp.sum(jnp.argmax(logits, axis=1) == y)
        new_state = {
            "params": params,
            "bn_state": bn_state,
            "opt_state": opt_state,
            "step": state["step"] + 1,
        }
        return new_state, {"loss": loss, "correct": correct,
                           "n": jnp.asarray(y.shape[0])}

    return step, (conv_cfg, lin_cfg)


def make_eval_step(cfg: TrainConfig):
    """jit-able eval step: per-class correct/total + summed loss
    (supervised_training.py:184-215 semantics, vectorized)."""
    conv_cfg = ConvNetConfig(
        hidden_channels=cfg.conv_hidden_channels,
        n_conv_layers=cfg.conv_layers,
        average_pool_size=cfg.avg_pool_size,
    )
    lin_cfg = LinearNetConfig(
        n_layers=cfg.linear_layers,
        input_size=conv_cfg.feature_size,
        hidden_size=cfg.linear_size,
        output_size=cfg.output_size,
    )

    cd = _train_compute_dtype(cfg)

    def step(state, x_u8, y):
        x = x_u8.astype(jnp.float32) / 255.0
        feats, _ = apply_frame_conv(state["params"]["conv"],
                                    state["bn_state"]["conv"], x, conv_cfg,
                                    train=False, compute_dtype=cd)
        logits, _ = apply_frame_linear(state["params"]["linear"],
                                       state["bn_state"]["linear"], feats,
                                       lin_cfg, train=False,
                                       compute_dtype=cd)
        loss = cross_entropy_sum(logits, y)
        pred = jnp.argmax(logits, axis=1)
        classes = jnp.arange(cfg.output_size)
        is_class = y[None, :] == classes[:, None]           # [C, B]
        correct = jnp.sum(is_class & (pred == y)[None, :], axis=1)
        total = jnp.sum(is_class, axis=1)
        return {"loss": loss, "correct": correct, "total": total}

    return step


def jit_steps(cfg: TrainConfig, mesh=None, optimizer=None):
    """jit the train/eval steps, optionally sharded over a mesh.

    With a mesh, the batch arguments shard over ``data`` and the state
    replicates; XLA handles the gradient reduction.  Without one, plain
    single-device jit.
    """
    step, cfgs = make_train_step(cfg, optimizer)
    eval_step = make_eval_step(cfg)
    if mesh is None:
        # Donate the state: each step's input buffers are dead afterwards,
        # so XLA reuses them in place (halves train-state HBM residency).
        return (jax.jit(step, donate_argnums=(0,)), jax.jit(eval_step), cfgs)

    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    train = jax.jit(step, in_shardings=(repl, data, data),
                    out_shardings=(repl, repl), donate_argnums=(0,))
    evl = jax.jit(eval_step, in_shardings=(repl, data, data),
                  out_shardings=repl)
    return train, evl, cfgs


@dataclasses.dataclass
class EpochMetrics:
    loss: float = 0.0
    n: int = 0
    correct: int = 0


def train_supervised(cfg: TrainConfig, datasets, *, mesh=None,
                     num_workers: int = 4, eval_only: bool = False,
                     state: dict | None = None,
                     checkpoint_dir: str | None = None,
                     start_epoch: int = 0) -> dict[str, Any]:
    """Full training loop over a list of SupervisedFrameDataset-likes.

    Returns ``{"state": ..., "history": ...}``.  See
    cli/train_supervised.py for the script-level wrapper that mirrors the
    reference's constants and save format.  ``start_epoch`` (a resumed
    run) continues the epoch numbering, so checkpoint snapshots stay
    monotonic and ``latest_checkpoint`` never resolves to a stale
    pre-crash file.
    """
    from cut_detection_tpu.data.frames import ConcatDataset
    from cut_detection_tpu.data.loader import PrefetchLoader, iter_batches

    ds = ConcatDataset(datasets)
    rng = np.random.default_rng(cfg.seed)
    perm = rng.permutation(len(ds))
    split = int(np.floor(len(ds) * (1 - cfg.valid_fraction)))
    train_idx, valid_idx = perm[:split], perm[split:]
    logger.info("Training frames: %d | Validation frames: %d",
                len(train_idx), len(valid_idx))

    train_step, eval_step, _ = jit_steps(cfg, mesh)
    key = jax.random.PRNGKey(cfg.seed)
    if state is None:
        state = init_train_state(key, cfg)
    if mesh is not None:
        from cut_detection_tpu.parallel.sharding import replicate

        state = replicate(mesh, state)

    history = []
    for epoch in range(start_epoch, cfg.epochs):
        if not eval_only:
            logger.info("Starting epoch %d of %d", epoch + 1, cfg.epochs)
            m = EpochMetrics()
            wl, wn = 0.0, 0  # windowed log accumulators (reference
            # resets after every write, supervised_training.py:161-168,
            # so each Loss: line is the mean over the last window — the
            # epoch totals below still feed history)
            # The tail train batch is KEPT on a single device (reference
            # drop_last=False: every frame trains each epoch; the odd
            # shape costs one extra jit compile).  Under a mesh the tail
            # is dropped — an indivisible batch can't shard over the
            # data axis, and padding would pollute the BN batch stats.
            batches = iter_batches(ds, cfg.batch_size, indices=train_idx,
                                   shuffle=True, seed=cfg.seed + epoch,
                                   drop_last=mesh is not None,
                                   num_workers=num_workers)
            for i, batch in enumerate(PrefetchLoader(batches)):
                state, metrics = train_step(state, batch["x"], batch["y"])
                m.loss += float(metrics["loss"])
                m.n += int(metrics["n"])
                m.correct += int(metrics["correct"])
                wl += float(metrics["loss"])
                wn += int(metrics["n"])
                if i % cfg.write_every_n == cfg.write_every_n - 1:
                    logger.info("Epoch %d | Batch %d | Loss: %.3f",
                                epoch + 1, i + 1, wl / max(wn, 1))
                    wl, wn = 0.0, 0
            history.append({"epoch": epoch, "train_loss": m.loss / max(m.n, 1),
                            "train_acc": m.correct / max(m.n, 1)})

        # Validation with per-class accuracy.  The tail batch is kept
        # (reference drop_last=False, supervised_training.py:85-91); its
        # different shape costs one extra jit compile, not correctness.
        # Under a mesh the sharded eval rejects a tail whose size does
        # not divide the data axis, so the tail runs through a plain-jit
        # fallback (replicated compute for ONE small batch).
        eval_tail = None
        correct = np.zeros(cfg.output_size)
        total = np.zeros(cfg.output_size)
        vloss, vn = 0.0, 0
        batches = iter_batches(ds, cfg.batch_size, indices=valid_idx,
                               drop_last=False, num_workers=num_workers)
        for batch in PrefetchLoader(batches):
            step_fn = eval_step
            if (mesh is not None
                    and batch["x"].shape[0] % mesh.shape["data"]):
                if eval_tail is None:
                    eval_tail = jax.jit(make_eval_step(cfg))
                step_fn = eval_tail
            metrics = step_fn(state, batch["x"], batch["y"])
            correct += np.asarray(metrics["correct"])
            total += np.asarray(metrics["total"])
            vloss += float(metrics["loss"])
            vn += int(np.asarray(metrics["total"]).sum())
        for c, name in enumerate(["A22", "EZ", "blank"][: cfg.output_size]):
            acc = correct[c] / max(total[c], 1)
            logger.info("Valid accuracy for %s: %.3f", name, acc)
        if history:
            history[-1].update({
                "valid_loss": vloss / max(vn, 1),
                "valid_acc_per_class": (correct / np.maximum(total, 1)).tolist(),
            })
        if (checkpoint_dir and cfg.checkpoint_every_n and not eval_only
                and (epoch + 1) % cfg.checkpoint_every_n == 0):
            from cut_detection_tpu.train.checkpointing import save_train_state

            save_train_state(checkpoint_dir, state, cfg, epoch)
        if eval_only:
            break

    return {"state": state, "history": history}
