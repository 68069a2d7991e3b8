"""Native checkpoint format round trips."""

import numpy as np

from cut_detection_tpu.checkpoint.io import (
    flatten_tree,
    load_bundle,
    save_bundle,
    unflatten_tree,
)


def _example_tree():
    return {
        "conv": {
            "params": [
                {"kernel": np.ones((3, 3, 3, 4), np.float32),
                 "bias": np.zeros(4, np.float32)},
                {"kernel": np.full((3, 3, 4, 4), 2.0, np.float32),
                 "bias": np.arange(4, dtype=np.float32)},
            ],
            "state": [{"mean": np.zeros(4, np.float32)},
                      {"mean": np.ones(4, np.float32)}],
        },
        "linear": {
            "params": [{"kernel": np.eye(4, dtype=np.float32)}],
            # Empty dict leaf: final FC layer has no BN state.
            "state": [{}],
        },
    }


def test_flatten_unflatten_roundtrip():
    tree = _example_tree()
    flat = flatten_tree(tree)
    back = unflatten_tree(flat)
    assert back["linear"]["state"] == [{}]
    np.testing.assert_array_equal(
        back["conv"]["params"][1]["kernel"], tree["conv"]["params"][1]["kernel"]
    )
    assert isinstance(back["conv"]["params"], list)
    assert len(back["conv"]["params"]) == 2


def test_save_load_roundtrip(tmp_path):
    tree = _example_tree()
    path = str(tmp_path / "ckpt.npz")
    save_bundle(path, tree)
    back = load_bundle(path)
    assert back["linear"]["state"] == [{}]
    np.testing.assert_array_equal(
        back["conv"]["params"][0]["kernel"], tree["conv"]["params"][0]["kernel"]
    )


def test_prod_bundle_loads():
    from cut_detection_tpu.models.assembly import load_default_net

    net, params = load_default_net()
    assert params["conv_channels"] == 48
    assert len(net.bundle["conv"]["params"]) == 3
    assert len(net.bundle["linear"]["params"]) == 2
    # Final FC layer: no BN (frameID/net.py:167).
    assert "gamma" not in net.bundle["linear"]["params"][1]


def test_empty_list_nodes_round_trip(tmp_path):
    """Empty list/tuple nodes survive save/load (an empty-dict marker
    existed; empty lists used to vanish silently)."""
    from cut_detection_tpu.checkpoint.io import load_bundle, save_bundle

    tree = {"params": [np.ones((2,))], "state": [], "extra": {}}
    path = str(tmp_path / "b.npz")
    save_bundle(path, tree)
    out = load_bundle(path)
    assert out["state"] == []
    assert out["extra"] == {}
    np.testing.assert_array_equal(out["params"][0], np.ones((2,)))
