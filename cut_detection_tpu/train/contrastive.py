"""SimCLR contrastive pretraining (analog of
training_scripts/learn_contrasts.py, redesigned TPU-first).

Reference semantics kept: conv backbone + projection head trained jointly
with AdamW (learn_contrasts.py:84-89), NT-Xent with temperature 1.0 and L2
normalization (frameID/metrics.py:13), two augmented views per image
concatenated along batch (:105-107), ``drop_last`` batches (:59-61, the
loss is shaped by the batch size).

TPU-first changes: the two augmented views are generated **on device**
(train/augment.py) from a single uint8 upload; the whole
augment→encode→project→NT-Xent→update step is one jit'd program; batch
shards over the mesh's ``data`` axis when a mesh is given.
"""

from __future__ import annotations

import logging
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cut_detection_tpu.config import ContrastiveConfig, ConvNetConfig, LinearNetConfig
from cut_detection_tpu.models.frame_conv import (
    apply_frame_conv,
    apply_frame_linear,
    init_frame_conv,
    init_frame_linear,
)
from cut_detection_tpu.train.augment import (
    fast_simclr_two_views,
    simclr_two_views,
)
from cut_detection_tpu.train.losses import ntxent_loss

logger = logging.getLogger(__name__)


def _configs(cfg: ContrastiveConfig):
    conv_cfg = ConvNetConfig(hidden_channels=cfg.conv_hidden_channels,
                             n_conv_layers=cfg.conv_layers,
                             average_pool_size=1)  # learn_contrasts.py:68-70
    lin_cfg = LinearNetConfig(n_layers=cfg.linear_layers,
                              input_size=conv_cfg.feature_size,
                              hidden_size=cfg.linear_size,
                              output_size=cfg.output_size)
    return conv_cfg, lin_cfg


def make_optimizer(cfg: ContrastiveConfig) -> optax.GradientTransformation:
    return optax.adamw(cfg.learning_rate, b1=0.9, b2=0.999, eps=1e-8,
                       weight_decay=cfg.weight_decay)


def init_contrastive_state(key, cfg: ContrastiveConfig, optimizer=None) -> dict:
    conv_cfg, lin_cfg = _configs(cfg)
    k1, k2 = jax.random.split(key)
    conv_p, conv_s = init_frame_conv(k1, conv_cfg)
    lin_p, lin_s = init_frame_linear(k2, lin_cfg)
    params = {"conv": conv_p, "linear": lin_p}
    optimizer = optimizer or make_optimizer(cfg)
    return {
        "params": params,
        "bn_state": {"conv": conv_s, "linear": lin_s},
        "opt_state": optimizer.init(params),
        "step": jnp.zeros((), jnp.int32),
    }


def make_contrastive_step(cfg: ContrastiveConfig, optimizer=None,
                          view_size: tuple[int, int] = (144, 256)):
    """jit-able ``step(state, key, x_u8) -> (state, metrics)``.

    ``x_u8``: [B, H, W, 3] uint8 RGB originals; the two views are produced
    on device and concatenated to 2B (learn_contrasts.py:105).
    """
    conv_cfg, lin_cfg = _configs(cfg)
    optimizer = optimizer or make_optimizer(cfg)
    from cut_detection_tpu.train.supervised import _train_compute_dtype

    cd = _train_compute_dtype(cfg)

    def loss_fn(params, bn_state, views):
        feats, conv_s = apply_frame_conv(params["conv"], bn_state["conv"],
                                         views, conv_cfg, train=True,
                                         compute_dtype=cd)
        proj, lin_s = apply_frame_linear(params["linear"],
                                         bn_state["linear"], feats, lin_cfg,
                                         train=True, compute_dtype=cd)
        loss, logits_ab, labels = ntxent_loss(
            proj, temperature=cfg.temperature)
        acc = jnp.mean(jnp.argmax(logits_ab, axis=1) == labels)
        return loss, ({"conv": conv_s, "linear": lin_s}, acc)

    two_views = (fast_simclr_two_views if cfg.fast_augment
                 else simclr_two_views)

    def step(state, key, x_u8):
        views = two_views(key, x_u8, view_size)
        (loss, (bn_state, acc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state["params"], state["bn_state"], views)
        updates, opt_state = optimizer.update(grads, state["opt_state"],
                                              state["params"])
        params = optax.apply_updates(state["params"], updates)
        new_state = {
            "params": params,
            "bn_state": bn_state,
            "opt_state": opt_state,
            "step": state["step"] + 1,
        }
        return new_state, {"loss": loss, "align_acc": acc}

    return step, (conv_cfg, lin_cfg)


def train_contrastive(cfg: ContrastiveConfig, dataset, *, mesh=None,
                      num_workers: int = 4,
                      state: dict | None = None) -> dict[str, Any]:
    """Full pretraining loop over a ContrastiveFrameDataset-like."""
    from cut_detection_tpu.data.loader import PrefetchLoader, iter_batches

    step, _ = make_contrastive_step(cfg)
    # Donate the state like supervised.jit_steps: each step's input
    # buffers are dead afterwards, so XLA reuses them in place instead
    # of holding two copies of params+optimizer state in HBM.
    if mesh is None:
        step = jax.jit(step, donate_argnums=(0,))
    else:
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        step = jax.jit(step, in_shardings=(repl, repl, data),
                       out_shardings=(repl, repl), donate_argnums=(0,))

    key = jax.random.PRNGKey(cfg.seed)
    if state is None:
        state = init_contrastive_state(key, cfg)
    if mesh is not None:
        from cut_detection_tpu.parallel.sharding import replicate

        state = replicate(mesh, state)

    history = []
    for epoch in range(cfg.epochs):
        logger.info("Starting epoch %d of %d", epoch + 1, cfg.epochs)
        accum, n_obs = 0.0, 0
        batches = iter_batches(dataset, cfg.batch_size, shuffle=True,
                               seed=cfg.seed + epoch, drop_last=True,
                               num_workers=num_workers)
        for i, batch in enumerate(PrefetchLoader(batches)):
            key, sub = jax.random.split(key)
            state, metrics = step(state, sub, batch["x"])
            # Reference metric semantics (learn_contrasts.py:113-122):
            # accumulate the SCALAR batch loss, count 2B rows — the
            # logged value is loss/2B, comparable with reference logs.
            accum += float(metrics["loss"])
            n_obs += batch["x"].shape[0] * 2
            if i % cfg.write_every_n == cfg.write_every_n - 1:
                logger.info("Epoch %d | Batch %d | Loss: %.3f",
                            epoch + 1, i + 1, accum / max(n_obs, 1))
                accum, n_obs = 0.0, 0
        history.append({"epoch": epoch})
    return {"state": state, "history": history}
