"""Model export tool (training_scripts/make_torchscript_model.py analog).

The reference traces the glued net with TorchScript for hypothetical C++
deployment (make_torchscript_model.py:25-34).  The TPU-native equivalents:

- ``--format stablehlo``: AOT-serialize the jitted forward with
  ``jax.export`` — a portable StableHLO artifact loadable from C++ (PJRT)
  or Python, the actual deployment path for XLA runtimes.
- ``--format torch``: emit torch ``.pt`` state dicts loadable by the
  reference's ``frameID`` modules (interop bridge).
- ``--format flax``: emit a flax msgpack checkpoint of
  ``models/flax_module.GluedClassifier`` variables (+ params JSON
  sidecar) for teams living in the flax/linen ecosystem; verified by
  re-running the linen module on the exported variables.

Like the reference, it logs eager vs exported outputs side by side as a
consistency check (make_torchscript_model.py:31-32).
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np

from cut_detection_tpu.utils.logging import setup_logging
from cut_detection_tpu.config import PRECISION_CHOICES


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("Export the glued classifier.",
                                fromfile_prefix_chars="@")
    p.add_argument("--model-dir", type=str, default="./models")
    p.add_argument("--model-name", type=str, default="init_model")
    p.add_argument("--use-default-net", action="store_true",
                   help="Export the bundled prod classifier instead of a "
                        "triplet from --model-dir.")
    p.add_argument("--format", choices=["stablehlo", "torch", "flax"],
                   default="stablehlo")
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--height", type=int, default=144)
    p.add_argument("--width", type=int, default=256)
    p.add_argument("--precision",
                   choices=list(PRECISION_CHOICES),
                   default="float32",
                   help="Precision mode baked into the exported program.")
    p.add_argument("--output", type=str, default=None)
    return p


def main(args=None) -> str:
    ns = build_parser().parse_args(args)
    setup_logging()

    import jax

    from cut_detection_tpu.models.assembly import (
        load_default_net,
        load_triplet_or_default,
    )

    if ns.use_default_net:
        net, params = load_default_net(precision=ns.precision)
    else:
        # npz preferred, reference-format torch .pt accepted — exporting
        # a reference checkpoint is exactly the make_torchscript_model.py
        # use case this tool replaces.
        net, params = load_triplet_or_default(
            ns.model_dir, ns.model_name, precision=ns.precision)

    rng = np.random.default_rng(0)
    example = rng.random((ns.batch_size, ns.height, ns.width, 3),
                         dtype=np.float32)
    eager = np.asarray(net(example))
    logging.info("Normal: %s", eager)

    if ns.format == "torch":
        import torch

        from cut_detection_tpu.checkpoint.convert import (
            export_torch_state_dicts,
        )

        conv_sd, lin_sd = export_torch_state_dicts(
            jax.device_get(net.bundle))
        out = ns.output or os.path.join(ns.model_dir,
                                        f"{ns.model_name}_torch_export")
        os.makedirs(out, exist_ok=True)
        torch.save(conv_sd, os.path.join(out, "classifier_conv.pt"))
        torch.save(lin_sd, os.path.join(out, "classifier_linear.pt"))
        logging.info("Wrote torch state dicts to %s", out)
        return out

    if ns.format == "flax":
        import json

        from flax import serialization

        from cut_detection_tpu.models.flax_module import (
            GluedClassifier,
            bundle_to_variables,
        )

        variables = bundle_to_variables(jax.device_get(net.bundle))
        out = ns.output or os.path.join(ns.model_dir,
                                        f"{ns.model_name}_flax")
        os.makedirs(out, exist_ok=True)
        with open(os.path.join(out, "variables.msgpack"), "wb") as f:
            f.write(serialization.to_bytes(variables))
        with open(os.path.join(out, "model_params.json"), "w") as f:
            json.dump(net.model_params.to_dict(), f)
        # Consistency check: the linen module on the exported variables
        # must reproduce the eager logits.
        module = GluedClassifier(net.model_params)
        with open(os.path.join(out, "variables.msgpack"), "rb") as f:
            restored = serialization.from_bytes(variables, f.read())
        traced = np.asarray(module.apply(restored, example))
        logging.info("Exported (flax): %s", traced)
        logging.info("Max diff eager vs flax: %.3e",
                     np.abs(eager - traced).max())
        # The linen module always runs full-precision; widen the gate
        # when the eager side ran a bf16 mode.
        atol = 1e-5 if ns.precision == "float32" else 0.1
        if not np.allclose(eager, traced, atol=atol):
            raise AssertionError("flax export consistency check failed")
        logging.info("Wrote flax checkpoint to %s", out)
        return out

    # StableHLO AOT export.
    from cut_detection_tpu.models.assembly import _glued_apply

    bundle = jax.device_get(net.bundle)

    def forward(x):
        return _glued_apply(bundle, x, conv_cfg=net.conv_cfg,
                            linear_cfg=net.linear_cfg,
                            compute_dtype=net.compute_dtype)

    exported = jax.export.export(jax.jit(forward))(
        jax.ShapeDtypeStruct(example.shape, np.float32))
    blob = exported.serialize()
    out = ns.output or os.path.join(ns.model_dir,
                                    f"{ns.model_name}_exported.stablehlo")
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with open(out, "wb") as f:
        f.write(blob)
    # Consistency check like make_torchscript_model.py:31-32.
    rehydrated = jax.export.deserialize(blob)
    traced = np.asarray(rehydrated.call(example))
    logging.info("Exported: %s", traced)
    logging.info("Max diff eager vs exported: %.3e",
                 np.abs(eager - traced).max())
    logging.info("Wrote %d bytes to %s", len(blob), out)
    return out


if __name__ == "__main__":
    main()
