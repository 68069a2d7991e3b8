"""torch checkpoint -> JAX pytree conversion.

The reference ships its prod classifier as two pickled torch state dicts
plus a params JSON (frameID/prod_net/, loaded by net.py:193-217).  This
module converts those into the native bundle format:

- conv weights  OIHW -> HWIO          (nn.Conv2d -> lax.conv NHWC/HWIO)
- linear weights [out, in] -> [in, out]
- BatchNorm ``weight``/``bias``/``running_mean``/``running_var`` map to
  ``gamma``/``beta``/``state.mean``/``state.var``; ``num_batches_tracked``
  is dropped (only relevant to torch's momentum=None mode, unused here).

torch is an optional dependency: it is imported lazily and only needed when
actually converting a ``.pt`` file.
"""

from __future__ import annotations

import numpy as np

from cut_detection_tpu.config import ModelParams


def _to_np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy(), dtype=np.float32)


def _load_state_dict(path: str):
    import torch  # lazy: only needed for conversion

    return torch.load(path, map_location="cpu", weights_only=True)


def convert_conv_state_dict(sd, n_layers: int):
    """frameID CNNLayer stack state dict -> (params, state) lists.

    Key layout per layer i (from net.py:11-40 module structure):
    ``conv_layers.{i}.conv.weight|bias`` and
    ``conv_layers.{i}.bn.weight|bias|running_mean|running_var``.
    """
    params, state = [], []
    for i in range(n_layers):
        pfx = f"conv_layers.{i}."
        params.append({
            "kernel": _to_np(sd[pfx + "conv.weight"]).transpose(2, 3, 1, 0),
            "bias": _to_np(sd[pfx + "conv.bias"]),
            "gamma": _to_np(sd[pfx + "bn.weight"]),
            "beta": _to_np(sd[pfx + "bn.bias"]),
        })
        state.append({
            "mean": _to_np(sd[pfx + "bn.running_mean"]),
            "var": _to_np(sd[pfx + "bn.running_var"]),
        })
    return params, state


def convert_linear_state_dict(sd, n_layers: int):
    """frameID FCLayer stack state dict -> (params, state) lists.

    Final layer has no BN (net.py:167).  Keys per layer i:
    ``layers.{i}.linear.weight|bias`` (+ ``layers.{i}.bn.*`` when present).
    """
    params, state = [], []
    for i in range(n_layers):
        pfx = f"layers.{i}."
        p = {
            "kernel": _to_np(sd[pfx + "linear.weight"]).T.copy(),
            "bias": _to_np(sd[pfx + "linear.bias"]),
        }
        if pfx + "bn.weight" in sd:
            p["gamma"] = _to_np(sd[pfx + "bn.weight"])
            p["beta"] = _to_np(sd[pfx + "bn.bias"])
            state.append({
                "mean": _to_np(sd[pfx + "bn.running_mean"]),
                "var": _to_np(sd[pfx + "bn.running_var"]),
            })
        else:
            state.append({})
        params.append(p)
    return params, state


def convert_torch_checkpoint(param_file: str, conv_file: str,
                             linear_file: str):
    """Convert a full reference checkpoint triplet into a native bundle.

    Returns ``(bundle, model_params)`` where ``bundle`` is the tree
    ``{conv: {params, state}, linear: {params, state}}`` consumed by
    ``models.assembly.GluedNet``.
    """
    model_params = ModelParams.from_json(param_file)
    conv_sd = _load_state_dict(conv_file)
    linear_sd = _load_state_dict(linear_file)
    conv_p, conv_s = convert_conv_state_dict(conv_sd, model_params.conv_layers)
    lin_p, lin_s = convert_linear_state_dict(linear_sd,
                                             model_params.linear_layers)
    bundle = {
        "conv": {"params": conv_p, "state": conv_s},
        "linear": {"params": lin_p, "state": lin_s},
    }
    return bundle, model_params


def export_torch_state_dicts(bundle):
    """Native bundle -> torch-style state dicts (the reverse mapping).

    Replaces the reference's TorchScript export path
    (training_scripts/make_torchscript_model.py) as the interop bridge:
    models trained here can be handed back to the torch reference.
    Returns ``(conv_sd, linear_sd)`` as dicts of torch tensors.
    """
    import torch  # lazy

    def t(arr):
        # copy(): jax buffers are read-only numpy views; torch wants writable.
        return torch.from_numpy(np.asarray(arr).copy())

    conv_sd = {}
    for i, (p, s) in enumerate(zip(bundle["conv"]["params"],
                                   bundle["conv"]["state"])):
        pfx = f"conv_layers.{i}."
        conv_sd[pfx + "conv.weight"] = t(
            np.asarray(p["kernel"]).transpose(3, 2, 0, 1))
        conv_sd[pfx + "conv.bias"] = t(p["bias"])
        conv_sd[pfx + "bn.weight"] = t(p["gamma"])
        conv_sd[pfx + "bn.bias"] = t(p["beta"])
        conv_sd[pfx + "bn.running_mean"] = t(s["mean"])
        conv_sd[pfx + "bn.running_var"] = t(s["var"])
        conv_sd[pfx + "bn.num_batches_tracked"] = torch.tensor(0)
    linear_sd = {}
    for i, (p, s) in enumerate(zip(bundle["linear"]["params"],
                                   bundle["linear"]["state"])):
        pfx = f"layers.{i}."
        linear_sd[pfx + "linear.weight"] = t(np.asarray(p["kernel"]).T)
        linear_sd[pfx + "linear.bias"] = t(p["bias"])
        if "gamma" in p:
            linear_sd[pfx + "bn.weight"] = t(p["gamma"])
            linear_sd[pfx + "bn.bias"] = t(p["beta"])
            linear_sd[pfx + "bn.running_mean"] = t(s["mean"])
            linear_sd[pfx + "bn.running_var"] = t(s["var"])
            linear_sd[pfx + "bn.num_batches_tracked"] = torch.tensor(0)
    return conv_sd, linear_sd
