"""Native checkpoint format: a flat ``.npz`` of arrays keyed by tree path.

Replaces the reference's pickled torch state dicts (net.py:203,212;
supervised_training.py:224-227) with a dependency-free, pickle-free format.
The ``*_model_params.json`` sidecar contract is kept unchanged
(cut_detection_tpu/config.py:ModelParams).

Trees here are nests of dict / list / tuple with array leaves.  Paths are
joined with '/'; list indices are encoded as decimal segments, and ``{}``
(an empty dict leaf, e.g. "no BN state for the final FC layer") is encoded
with a ``__empty__`` marker so round-trips are exact.
"""

from __future__ import annotations

import numpy as np

_EMPTY = "__empty__"
_EMPTY_LIST = "__empty_list__"


def flatten_tree(tree, prefix=""):
    """Flatten a nest of dict/list/tuple into {path: np.ndarray}."""
    out = {}
    if isinstance(tree, dict):
        if not tree:
            out[prefix + _EMPTY] = np.zeros((), dtype=np.int8)
            return out
        for k, v in tree.items():
            out.update(flatten_tree(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        if not tree:
            # An empty list must survive the round trip too, or the
            # reloaded tree silently loses the node (KeyError later).
            out[prefix + _EMPTY_LIST] = np.zeros((), dtype=np.int8)
            return out
        for i, v in enumerate(tree):
            out.update(flatten_tree(v, f"{prefix}{i}/"))
    else:
        out[prefix.rstrip("/")] = np.asarray(tree)
    return out


def unflatten_tree(flat: dict):
    """Inverse of ``flatten_tree``.  Integer-keyed levels become lists."""
    root: dict = {}
    for path, value in flat.items():
        parts = path.split("/")
        node = root
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        leaf = parts[-1]
        if leaf == _EMPTY:
            continue  # marker: the parent dict exists but is empty
        if leaf == _EMPTY_LIST:
            node[_EMPTY_LIST] = True
            continue
        node[leaf] = value

    def normalize(node):
        if not isinstance(node, dict):
            return node
        if _EMPTY_LIST in node:
            return []
        if node and all(k.isdigit() for k in node):
            return [normalize(node[str(i)]) for i in range(len(node))]
        return {k: normalize(v) for k, v in node.items()}

    return normalize(root)


def save_bundle(path: str, tree) -> None:
    """Save a pytree bundle to ``.npz``."""
    flat = flatten_tree(tree)
    np.savez(path, **flat)


def load_bundle(path: str):
    """Load a pytree bundle saved by ``save_bundle``."""
    with np.load(path) as data:
        flat = {k: data[k] for k in data.files}
    return unflatten_tree(flat)
