"""Batched embedding inference CLI (BASELINE.md config #3).

Runs a contrastive (conv + projection head) model over a video or a
directory of frames and writes the embeddings as ``.npz`` — the batched
inference form of the learn_contrasts.py model family, which the
reference itself never exposed.
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np

from cut_detection_tpu.utils.logging import setup_logging
from cut_detection_tpu.config import PRECISION_CHOICES


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("Embed frames with a contrastive model.",
                                fromfile_prefix_chars="@")
    p.add_argument("input_path", type=str,
                   help="Video file or directory of frames.")
    p.add_argument("--model-dir", type=str, required=True)
    p.add_argument("--model-name", type=str, default="init_model")
    p.add_argument("--output", type=str, default=None,
                   help="Output .npz (default: input stem + "
                        "_embeddings.npz).")
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--resize", type=int, default=256)
    p.add_argument("--frame-limit", type=int, default=None)
    p.add_argument("--precision",
                   choices=list(PRECISION_CHOICES),
                   default="float32")
    p.add_argument("--cpu", action="store_true")
    return p


def main(args=None) -> str:
    ns = build_parser().parse_args(args)
    setup_logging()

    from cut_detection_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax

    if ns.cpu:
        from cut_detection_tpu.utils.platform import force_cpu

        force_cpu()
    from cut_detection_tpu.utils.platform import init_devices

    # CUTDET_INIT_TIMEOUT bounds backend init like the other CLIs (a
    # wedged device tunnel otherwise hangs the batch job forever).
    logging.info("Using %s", init_devices()[0].platform)

    from cut_detection_tpu.models.assembly import load_embedding_net
    from cut_detection_tpu.ops.preprocess import normalize_frames

    net, params = load_embedding_net(ns.model_dir, ns.model_name,
                                     precision=ns.precision)
    logging.info("Embedding model: %s", params)

    if os.path.isdir(ns.input_path):
        from cut_detection_tpu.data.frames import ContrastiveFrameDataset

        ds = ContrastiveFrameDataset(ns.input_path, ext=".jpg")

        def frames():
            # `is not None`, not truthiness: --frame-limit 0 means zero
            # frames (matching the video branch below), not "all".
            limit = ns.frame_limit if ns.frame_limit is not None else len(ds)
            for i in range(min(limit, len(ds))):
                # Dataset yields RGB; the device path expects BGR input to
                # normalize_frames, so flip back.
                yield ds[i]["x"][..., ::-1]
    else:
        from cut_detection_tpu.data.video import VideoFrameSource

        def frames():
            src = VideoFrameSource(ns.input_path, resize=ns.resize)
            for i, f in enumerate(src):
                if ns.frame_limit is not None and i >= ns.frame_limit:
                    break
                yield f

    from cut_detection_tpu.data.video import batch_frames

    embs = []
    count = 0
    for batch, valid in batch_frames(frames(), ns.batch_size):
        # Keep the normalized frames ON DEVICE: np.asarray here would
        # download the float32 tensor just to re-upload it to net() —
        # ~2x the batch's bytes in pointless PCIe/tunnel traffic.
        e = np.asarray(net(normalize_frames(batch)))
        embs.append(e[:valid])
        count += valid
    out = np.concatenate(embs) if embs else np.zeros((0,), np.float32)

    output = ns.output or os.path.splitext(ns.input_path.rstrip("/"))[0] \
        + "_embeddings.npz"
    np.savez(output, embeddings=out)
    logging.info("Wrote %d embeddings (dim %d) to %s", count,
                 out.shape[-1] if out.ndim == 2 else 0, output)
    return output


if __name__ == "__main__":
    main()
