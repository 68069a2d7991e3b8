"""Supervised training CLI (training_scripts/supervised_training.py analog).

The reference hard-codes its config as module constants and its data dirs
in source (supervised_training.py:23-60); here everything is flags (with
the reference's values as defaults) or an ``@argfile``.
"""

from __future__ import annotations

import argparse
import logging

from cut_detection_tpu.utils.logging import setup_logging


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("Train the frame classifier.",
                                fromfile_prefix_chars="@")
    p.add_argument("--data-dirs", nargs="+", required=True,
                   help="Frame directories (each with a labels CSV).")
    p.add_argument("--labs-file", type=str, default="frames.csv")
    p.add_argument("--conv-layers", type=int, default=3)
    p.add_argument("--conv-hidden-channels", type=int, default=48)
    p.add_argument("--avg-pool-size", type=int, default=4)
    p.add_argument("--linear-layers", type=int, default=2)
    p.add_argument("--linear-size", type=int, default=32)
    p.add_argument("--output-size", type=int, default=3)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--write-every-n", type=int, default=1000)
    p.add_argument("--learning-rate", type=float, default=1e-3)
    p.add_argument("--weight-decay", type=float, default=1e-2)
    p.add_argument("--data-size", type=int, default=None,
                   help="Optional per-dataset size cap.")
    p.add_argument("--model-dir", type=str, default="./models")
    p.add_argument("--model-name", type=str, default="init_model")
    p.add_argument("--load-conv-net", action="store_true",
                   help="Warm-start the conv net from "
                        "{model_dir}/{model_name}_conv.npz "
                        "(supervised_training.py:105-110 analog).")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--precision", choices=["float32", "bfloat16"],
                   default="float32",
                   help="bfloat16 = mixed precision: bf16 activations "
                        "on the MXU with f32 islands for BN stats and "
                        "the loss; params/grads/optimizer stay f32.")
    p.add_argument("--num-workers", type=int, default=4)
    p.add_argument("--checkpoint-every-n", type=int, default=1,
                   help="Save a resumable full-state snapshot every N "
                        "epochs (0 disables; reference saves only at end).")
    p.add_argument("--resume", action="store_true",
                   help="Resume from the latest snapshot in model-dir.")
    p.add_argument("--export-torch", action="store_true",
                   help="Also write torch .pt state dicts for the "
                        "reference implementation.")
    p.add_argument("--data-parallel", action="store_true",
                   help="Shard batches over all local devices.")
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

    from cut_detection_tpu.config import TrainConfig
    from cut_detection_tpu.data.frames import SupervisedFrameDataset
    from cut_detection_tpu.train.checkpointing import (
        latest_checkpoint,
        load_train_state,
        save_model_triplet,
    )
    from cut_detection_tpu.train.supervised import (
        init_train_state,
        train_supervised,
    )

    logging.info("Using %s", jax.devices()[0].platform)

    cfg = TrainConfig(
        conv_layers=ns.conv_layers,
        conv_hidden_channels=ns.conv_hidden_channels,
        avg_pool_size=ns.avg_pool_size,
        linear_layers=ns.linear_layers,
        linear_size=ns.linear_size,
        output_size=ns.output_size,
        batch_size=ns.batch_size,
        epochs=ns.epochs,
        write_every_n=ns.write_every_n,
        learning_rate=ns.learning_rate,
        weight_decay=ns.weight_decay,
        data_size=ns.data_size,
        model_dir=ns.model_dir,
        model_name=ns.model_name,
        load_conv_net=ns.load_conv_net,
        seed=ns.seed,
        checkpoint_every_n=ns.checkpoint_every_n,
        compute_dtype=None if ns.precision == "float32" else ns.precision,
    )

    datasets = [
        SupervisedFrameDataset(d, ns.labs_file, ext=".jpg", size=ns.data_size)
        for d in ns.data_dirs
    ]

    mesh = None
    if ns.data_parallel and len(jax.devices()) > 1:
        from cut_detection_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()

    state = None
    start_epoch = 0
    if ns.load_conv_net or ns.resume:
        state = init_train_state(jax.random.PRNGKey(cfg.seed), cfg)
    if ns.resume:
        ckpt = latest_checkpoint(cfg.model_dir)
        if ckpt:
            logging.info("Resuming from %s", ckpt)
            state = load_train_state(ckpt, state)
            # Continue the epoch numbering from the snapshot: a resumed
            # run restarting at epoch 0 would save train_state_0000.npz
            # below the pre-crash snapshots, and the NEXT resume would
            # restore the stale lexicographically-latest file, silently
            # rewinding training.
            import re

            m_ep = re.search(r"train_state_(\d+)\.npz$", ckpt)
            if m_ep:
                start_epoch = int(m_ep.group(1)) + 1
                if start_epoch >= cfg.epochs:
                    logging.info(
                        "Snapshot is from the final epoch (%d of %d); "
                        "nothing left to train.", start_epoch, cfg.epochs)
    elif ns.load_conv_net:
        from cut_detection_tpu.checkpoint.io import load_bundle
        import os

        path = os.path.join(cfg.model_dir, f"{cfg.model_name}_conv.npz")
        logging.info("Loading pre-trained conv net from: %s", path)
        conv = load_bundle(path)
        state["params"]["conv"] = conv["params"]
        state["bn_state"]["conv"] = conv["state"]

    result = train_supervised(cfg, datasets, mesh=mesh,
                              num_workers=ns.num_workers, state=state,
                              checkpoint_dir=cfg.model_dir,
                              start_epoch=start_epoch)

    save_model_triplet(cfg.model_dir, cfg.model_name, result["state"], cfg,
                       export_torch=ns.export_torch)
    logging.info("Saved model triplet to %s", cfg.model_dir)


if __name__ == "__main__":
    main()
