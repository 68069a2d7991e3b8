"""Orbax checkpoint backend round-trip."""

import numpy as np
import pytest

import jax

pytest.importorskip("orbax.checkpoint")

from cut_detection_tpu.config import TrainConfig
from cut_detection_tpu.train.checkpointing import (
    load_train_state_orbax,
    save_train_state_orbax,
)
from cut_detection_tpu.train.supervised import init_train_state, make_train_step


def test_orbax_roundtrip(tmp_path):
    cfg = TrainConfig(conv_layers=2, conv_hidden_channels=8, avg_pool_size=2,
                      linear_layers=2, linear_size=8, output_size=3,
                      batch_size=8, epochs=1)
    step, _ = make_train_step(cfg)
    step = jax.jit(step)
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    x = rng.integers(0, 255, size=(8, 27, 48, 3), dtype=np.uint8)
    y = rng.integers(0, 3, size=(8,)).astype(np.int64)
    state, _ = step(state, x, y)

    path = save_train_state_orbax(str(tmp_path), state, epoch=0)
    template = init_train_state(jax.random.PRNGKey(0), cfg)
    restored = load_train_state_orbax(path, template)

    s1, m1 = step(state, x, y)
    s2, m2 = step(restored, x, y)
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), abs=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s1),
                    jax.tree_util.tree_leaves(s2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
