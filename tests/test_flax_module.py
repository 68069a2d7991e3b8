"""flax.linen mirror equivalence tests (models/flax_module.py)."""

import numpy as np
import pytest

import jax

flax = pytest.importorskip("flax")

from cut_detection_tpu.config import ModelParams
from cut_detection_tpu.models.assembly import load_default_net
from cut_detection_tpu.models.flax_module import (
    GluedClassifier,
    bundle_to_variables,
    variables_to_bundle,
)


def test_flax_matches_glued_net():
    net, _ = load_default_net()
    module = GluedClassifier(net.model_params)
    variables = bundle_to_variables(jax.device_get(net.bundle))
    rng = np.random.default_rng(0)
    x = rng.random((4, 144, 256, 3), dtype=np.float32)
    logits = module.apply(variables, x)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(net(x)),
                               atol=1e-5)


def test_flax_init_and_roundtrip():
    mp = ModelParams(conv_layers=2, conv_channels=8, avg_pool_size=2,
                     linear_layers=2, linear_size=8, linear_output_size=3)
    module = GluedClassifier(mp)
    rng = np.random.default_rng(1)
    x = rng.random((2, 27, 48, 3), dtype=np.float32)
    variables = module.init(jax.random.PRNGKey(0), x)
    logits = module.apply(variables, x)
    assert logits.shape == (2, 3)
    # Round-trip through the bundle form.
    from cut_detection_tpu.models.assembly import GluedNet

    bundle = variables_to_bundle(variables)
    net = GluedNet(jax.device_get(bundle), mp)
    np.testing.assert_allclose(np.asarray(net(x)), np.asarray(logits),
                               atol=1e-5)


def test_flax_train_mode_updates_batch_stats():
    mp = ModelParams(conv_layers=2, conv_channels=8, avg_pool_size=2,
                     linear_layers=2, linear_size=8, linear_output_size=3)
    module = GluedClassifier(mp)
    rng = np.random.default_rng(2)
    x = rng.random((8, 27, 48, 3), dtype=np.float32)
    variables = module.init(jax.random.PRNGKey(0), x)
    _, mutated = module.apply(variables, x, train=True,
                              mutable=["batch_stats"])
    before = variables["batch_stats"]["conv"]["layers"][0]["mean"]
    after = mutated["batch_stats"]["conv"]["layers"][0]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))
