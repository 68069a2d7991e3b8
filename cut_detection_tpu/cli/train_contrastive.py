"""Contrastive pretraining CLI (training_scripts/learn_contrasts.py analog)."""

from __future__ import annotations

import argparse
import logging
import os

from cut_detection_tpu.utils.logging import setup_logging


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("SimCLR pretraining of the conv backbone.",
                                fromfile_prefix_chars="@")
    p.add_argument("--data-dir", type=str, required=True,
                   help="Directory of frames (learn_contrasts.py:58).")
    p.add_argument("--conv-layers", type=int, default=3)
    p.add_argument("--conv-hidden-channels", type=int, default=32)
    p.add_argument("--linear-layers", type=int, default=3)
    p.add_argument("--linear-size", type=int, default=32)
    p.add_argument("--output-size", type=int, default=8)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--write-every-n", type=int, default=50)
    p.add_argument("--learning-rate", type=float, default=1e-3)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--model-dir", type=str, default="./models")
    p.add_argument("--model-name", type=str, default="init_model")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--precision", choices=["float32", "bfloat16"],
                   default="float32",
                   help="bfloat16 = mixed precision (bf16 activations "
                        "on the MXU, f32 params/optimizer; NT-Xent and "
                        "BN stats stay f32).")
    p.add_argument("--fast-augment", action="store_true",
                   help="Composed affine+crop gather (2.29x faster step; "
                        "spatially exact, color-jitter divergences "
                        "documented in train/augment.py).")
    p.add_argument("--num-workers", type=int, default=4)
    p.add_argument("--data-parallel", action="store_true")
    p.add_argument("--cpu", action="store_true",
                   help="Force CPU execution even if a TPU is available.")
    return p


def main(args=None) -> None:
    ns = build_parser().parse_args(args)
    setup_logging()

    from cut_detection_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax

    if ns.cpu:
        from cut_detection_tpu.utils.platform import force_cpu

        force_cpu()

    from cut_detection_tpu.checkpoint.io import save_bundle
    from cut_detection_tpu.config import ContrastiveConfig
    from cut_detection_tpu.data.frames import ContrastiveFrameDataset
    from cut_detection_tpu.train.contrastive import train_contrastive

    logging.info("Using %s", jax.devices()[0].platform)

    cfg = ContrastiveConfig(
        conv_layers=ns.conv_layers,
        conv_hidden_channels=ns.conv_hidden_channels,
        linear_layers=ns.linear_layers,
        linear_size=ns.linear_size,
        output_size=ns.output_size,
        batch_size=ns.batch_size,
        epochs=ns.epochs,
        write_every_n=ns.write_every_n,
        learning_rate=ns.learning_rate,
        temperature=ns.temperature,
        model_dir=ns.model_dir,
        model_name=ns.model_name,
        seed=ns.seed,
        compute_dtype=None if ns.precision == "float32" else ns.precision,
        fast_augment=ns.fast_augment,
    )
    ds = ContrastiveFrameDataset(ns.data_dir, ext=".jpg")
    logging.info("Dataset size: %d frames", len(ds))

    mesh = None
    if ns.data_parallel and len(jax.devices()) > 1:
        from cut_detection_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()

    result = train_contrastive(cfg, ds, mesh=mesh,
                               num_workers=ns.num_workers)

    # Save conv + projection head (learn_contrasts.py:131-132 contract),
    # plus the params sidecar the reference never wrote — it makes the
    # embedding model loadable (models.assembly.load_embedding_net).
    import json

    os.makedirs(cfg.model_dir, exist_ok=True)
    state = jax.device_get(result["state"])
    save_bundle(os.path.join(cfg.model_dir, f"{cfg.model_name}_conv.npz"),
                {"params": state["params"]["conv"],
                 "state": state["bn_state"]["conv"]})
    save_bundle(os.path.join(cfg.model_dir, f"{cfg.model_name}_linear.npz"),
                {"params": state["params"]["linear"],
                 "state": state["bn_state"]["linear"]})
    with open(os.path.join(cfg.model_dir,
                           f"{cfg.model_name}_embed_params.json"), "w") as f:
        json.dump({
            "conv_layers": cfg.conv_layers,
            "conv_channels": cfg.conv_hidden_channels,
            "avg_pool_size": 1,          # learn_contrasts.py:68-70
            "linear_layers": cfg.linear_layers,
            "linear_size": cfg.linear_size,
            "linear_output_size": cfg.output_size,
        }, f)
    logging.info("Saved conv + projection head to %s", cfg.model_dir)


if __name__ == "__main__":
    main()
