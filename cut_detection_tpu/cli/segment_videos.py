"""Batch inference CLI: segment MANY videos with one model load/compile.

The multi-game configuration (BASELINE.md config #5).  With more than one
device, frame batches shard across the mesh's ``data`` axis
(``--data-parallel``).
"""

from __future__ import annotations

import argparse
import logging

from cut_detection_tpu.utils.logging import setup_logging
from cut_detection_tpu.config import PRECISION_CHOICES


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("Segment several videos into scenes.",
                                fromfile_prefix_chars="@")
    p.add_argument("input_paths", type=str, nargs="+",
                   help="Paths to videos to segment.")
    p.add_argument("--base-threshold", type=int, default=100)
    p.add_argument("--blank-threshold", type=int, default=10)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--print-every", type=int, default=0)
    p.add_argument("--decode-workers", type=int, default=1)
    p.add_argument("--no-decode-ahead", action="store_true",
                   help="Process videos strictly sequentially instead of "
                        "starting video i+1's host decode while video i "
                        "runs on the device.")
    p.add_argument("--device-resize", action="store_true")
    p.add_argument("--transfer", choices=["auto", "bgr", "yuv420"],
                   default="auto",
                   help="Host->device byte format: 'yuv420' uploads "
                        "planar YUV at 1.5 B/px (half of BGR24) and "
                        "converts on device (accuracy-gated fast path; "
                        "needs the native decoder's YUV entry points); "
                        "'auto' (default) picks yuv420 when it can run "
                        "and wins, bgr otherwise.")
    p.add_argument("--precision",
                   choices=list(PRECISION_CHOICES),
                   default="float32")
    p.add_argument("--data-parallel", action="store_true",
                   help="Shard frame batches across all local devices.")
    p.add_argument("--multi-host", action="store_true",
                   help="Initialize jax.distributed and give each host its "
                        "round-robin shard of the video list (no-op on a "
                        "single host).")
    p.add_argument("--model-dir", type=str, default=None,
                   help="Use a trained triplet instead of the bundled "
                        "prod classifier.")
    p.add_argument("--model-name", type=str, default="init_model")
    p.add_argument("--cpu", action="store_true")
    return p


def main(args=None) -> list[str]:
    parser = build_parser()
    ns = parser.parse_args(args)
    setup_logging()
    if ns.transfer == "yuv420" and ns.device_resize:
        # Mirror the pipeline's mutual-exclusion rule at parse time —
        # otherwise the ValueError surfaces deep inside classify_video,
        # after the model has loaded (ADVICE r4).
        parser.error("--transfer yuv420 cannot combine with "
                     "--device-resize (YUV frames arrive at model "
                     "resolution already); use --transfer auto or bgr")

    from cut_detection_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax

    if ns.cpu:
        from cut_detection_tpu.utils.platform import force_cpu

        force_cpu()
    from cut_detection_tpu.utils.platform import init_devices

    # CUTDET_INIT_TIMEOUT bounds backend init (batch jobs on a wedged
    # tunnel fail fast instead of hanging); unbounded when unset.
    devices = init_devices()
    logging.info("Using %s x%d", devices[0].platform, len(devices))

    inputs = ns.input_paths
    if ns.multi_host:
        from cut_detection_tpu.parallel.distributed import (
            initialize,
            partition_inputs,
        )

        pid = initialize()
        inputs = partition_inputs(inputs)
        logging.info("host %d processing %d of %d videos", pid,
                     len(inputs), len(ns.input_paths))

    mesh = None
    if ns.data_parallel and len(jax.devices()) > 1:
        from cut_detection_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()

    from cut_detection_tpu.pipeline import segment_many

    net = None
    if ns.model_dir:
        from cut_detection_tpu.models.assembly import load_triplet_or_default

        net, _ = load_triplet_or_default(ns.model_dir, ns.model_name,
                                         precision=ns.precision)

    results = segment_many(
        inputs,
        net=net,
        base_threshold=ns.base_threshold,
        blank_threshold=ns.blank_threshold,
        batch_size=ns.batch_size,
        print_every=ns.print_every,
        decode_workers=ns.decode_workers,
        device_resize=ns.device_resize,
        transfer=ns.transfer,
        precision=ns.precision,
        mesh=mesh,
        pipeline_decode=not ns.no_decode_ahead,
    )
    outs = [r[0] for r in results]
    for out, (_, seg, stats) in zip(outs, results):
        logging.info("%s: %d segments, %.1f fps", out, len(seg),
                     stats.frames_per_sec)
    return outs


if __name__ == "__main__":
    main()
