"""Training losses.

- ``cross_entropy_sum``: torch ``CrossEntropyLoss(reduction="sum")``
  (supervised_training.py:131) — softmax cross entropy summed over the
  batch.
- ``ntxent_loss``: the SimCLR NT-Xent contrastive loss, matching the
  reference's port (frameID/metrics.py:8-47) which itself follows
  google-research/simclr.  Batch of 2B projections = two augmented views
  concatenated; intra-view logits get their diagonal masked with a large
  negative; each view's positives are the aligned rows of the other view.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

BIG_NUMBER = 1e9  # frameID/metrics.py:5


def cross_entropy_sum(logits, labels) -> jax.Array:
    """Sum-reduced softmax cross entropy (CrossEntropyLoss(reduction='sum')).

    Always reduces in f32 (an f32 island for mixed-precision training;
    a no-op when logits are already f32)."""
    logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logprobs, labels[:, None], axis=-1)[:, 0]
    return jnp.sum(nll)


def ntxent_loss(x, *, temperature: float = 1.0, h_norm: bool = True):
    """NT-Xent over concatenated views ``x = [h1; h2]`` of shape [2B, D].

    Returns ``(loss, logits_ab, labels)`` like the reference module's
    forward (frameID/metrics.py:23-47).  The loss is
    ``mean(loss_a + loss_b)`` where each side is a cross entropy between a
    view's similarities to [other view ‖ own view (diag-masked)] and the
    aligned-index labels.
    """
    # f32 island: similarity logits and softmax in full precision (a
    # no-op for f32 projections; required numerics under bf16 mixed-
    # precision training, where BIG_NUMBER alone overflows bf16's range
    # headroom after the temperature divide).
    x = x.astype(jnp.float32)
    if h_norm:
        x = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
    b = x.shape[0] // 2
    h1, h2 = x[:b], x[b:]
    masks = jnp.eye(b, dtype=x.dtype)
    labels = jnp.arange(b)

    logits_aa = h1 @ h1.T / temperature - masks * BIG_NUMBER
    logits_bb = h2 @ h2.T / temperature - masks * BIG_NUMBER
    logits_ab = h1 @ h2.T / temperature
    logits_ba = logits_ab.T

    def ce_mean(logits, labels):
        logprobs = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(
            jnp.take_along_axis(logprobs, labels[:, None], axis=-1)[:, 0]
        )

    loss_a = ce_mean(jnp.concatenate([logits_ab, logits_aa], axis=-1), labels)
    loss_b = ce_mean(jnp.concatenate([logits_ba, logits_bb], axis=-1), labels)
    return loss_a + loss_b, logits_ab, labels


class ContrastiveLoss:
    """Drop-in class facade over ``ntxent_loss`` (frameID/metrics.py:8-47 API).

    The reference sizes its label/mask buffers to a fixed batch
    (metrics.py:20-21); here shapes are derived from the input, so
    ``batch_size`` is only validated, not baked in.
    """

    def __init__(self, batch_size: int = 32, h_norm: bool = True,
                 temperature: float = 1.0):
        self.batch_size = batch_size
        self.h_norm = h_norm
        self.temperature = temperature

    def __call__(self, x):
        if x.shape[0] != 2 * self.batch_size:
            raise ValueError(
                f"expected 2*batch_size={2 * self.batch_size} rows, got "
                f"{x.shape[0]} (the reference requires drop_last batches, "
                "learn_contrasts.py:59-61)")
        return ntxent_loss(x, temperature=self.temperature,
                           h_norm=self.h_norm)
