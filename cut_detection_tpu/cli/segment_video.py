"""Production inference CLI — drop-in analog of the reference's
segment_video.py (flags, defaults, logging shape, output naming preserved;
reference: segment_video.py:81-126).

Extra TPU-era flags (all optional, defaults match the reference exactly):

- ``--decode-workers N``   chunk-parallel host decode (N>1 enables it)
- ``--device-resize``      run the cv2-exact bilinear resize on the TPU
- ``--cache-scores PATH``  resumable per-frame score cache
- ``--profile DIR``        write a jax.profiler trace of the run
"""

from __future__ import annotations

import argparse
import logging

from cut_detection_tpu.utils.logging import setup_logging
from cut_detection_tpu.config import PRECISION_CHOICES


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        "Segment a video into scenes.", fromfile_prefix_chars="@"
    )
    p.add_argument("input_path", type=str, help="Path to video to segment.")
    p.add_argument("--output_path", type=str, default=None,
                   help="Path to output csv")
    p.add_argument(
        "--base-threshold", type=int, default=100,
        help="Number of frames below which an A22 or EZ segment will be "
             "considered an orphan.")
    p.add_argument(
        "--blank-threshold", type=int, default=10,
        help="Number of frames below which a blank segment will be "
             "considered an orphan.")
    p.add_argument("--batch-size", type=int, default=128,
                   help="Batch size for loading frames.")
    p.add_argument("--print-every", type=int, default=50,
                   help="Log message every n batches. 0 to disable.")
    p.add_argument("--frame-limit", type=int, default=None,
                   help="Limit how many frames are processed. Mainly for "
                        "testing.")
    p.add_argument("--cpu", action="store_true",
                   help="Force CPU execution even if a TPU is available.")
    # TPU-era extensions:
    p.add_argument("--decode-workers", type=int, default=1,
                   help="Parallel decode threads (1 = sequential reference "
                        "behavior).")
    p.add_argument("--decoder", choices=["cv2", "native", "auto"],
                   default="cv2",
                   help="Decode backend: OpenCV, the native libav stage, "
                        "or auto (native when built).")
    p.add_argument("--decode-process", choices=["auto", "on", "off"],
                   default="auto",
                   help="Run host decode in a subprocess feeding a shared-"
                        "memory batch ring so it overlaps the device "
                        "transfer (auto: on for accelerator backends).")
    p.add_argument("--transfer", choices=["auto", "bgr", "yuv420"],
                   default="auto",
                   help="Host->device frame format: bgr (3 B/px, byte-"
                        "parity path) or yuv420 (1.5 B/px planar upload, "
                        "bit-exact swscale YUV->BGR on device; accuracy-"
                        "gated fast path — the resize happens in YUV "
                        "space).  auto (default) picks yuv420 when an "
                        "accelerator + the native decoder are present "
                        "and the target dims are even, bgr otherwise.")
    p.add_argument("--device-resize", action="store_true",
                   help="Resize frames on the accelerator (bit-exact cv2 "
                        "emulation) instead of the host.")
    p.add_argument("--pallas-preprocess", action="store_true",
                   help="Use the fused Pallas resize+normalize kernel "
                        "(float bilinear fast path, implies on-device "
                        "preprocessing).")
    p.add_argument("--model-dir", type=str, default=None,
                   help="Load a trained model triplet from this directory "
                        "instead of the bundled prod classifier.")
    p.add_argument("--model-name", type=str, default="init_model",
                   help="Triplet name prefix within --model-dir.")
    p.add_argument("--device-glue", action="store_true",
                   help="Run the orphan-glue/merge smoother on the "
                        "accelerator as one compiled program instead of "
                        "the host loop (same output).")
    p.add_argument("--cache-scores", type=str, default=None,
                   help="Path to a per-frame score cache (.npz); resumes "
                        "from it if present.")
    p.add_argument("--profile", type=str, default=None,
                   help="Directory for a jax.profiler trace of the run.")
    p.add_argument("--precision",
                   choices=list(PRECISION_CHOICES),
                   default="float32",
                   help="float32 guarantees reference-parity CSVs; "
                        "bfloat16 uses bf16 MXU operands; bfloat16_full "
                        "also keeps activations bf16 (fastest).")
    return p


def main(args=None) -> str:
    parser = build_parser()
    ns = parser.parse_args(args)
    setup_logging()
    if ns.transfer == "yuv420" and (ns.device_resize or ns.pallas_preprocess):
        # Parse-time mutual exclusion (ADVICE r4): the pipeline's own
        # ValueError would otherwise surface only after the model loads.
        parser.error("--transfer yuv420 cannot combine with "
                     "--device-resize/--pallas-preprocess (YUV frames "
                     "arrive at model resolution already); use "
                     "--transfer auto or bgr")

    if ns.cpu:
        from cut_detection_tpu.utils.platform import force_cpu

        force_cpu()

    from cut_detection_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from cut_detection_tpu.utils.platform import init_devices

    # Unbounded by default (interactive use); CUTDET_INIT_TIMEOUT bounds
    # backend init for batch jobs so a wedged tunnel fails instead of
    # hanging the job forever.
    logging.info("Using %s", init_devices()[0].platform)

    from cut_detection_tpu.pipeline import segment_video_file
    from cut_detection_tpu.utils.profiling import maybe_trace

    net = None
    if ns.model_dir:
        from cut_detection_tpu.models.assembly import load_triplet_or_default

        net, _ = load_triplet_or_default(ns.model_dir, ns.model_name,
                                         precision=ns.precision)
        logging.info("Loaded model triplet %s from %s", ns.model_name,
                     ns.model_dir)

    with maybe_trace(ns.profile):
        out_path, _, _ = segment_video_file(
            ns.input_path,
            ns.output_path,
            net=net,
            base_threshold=ns.base_threshold,
            blank_threshold=ns.blank_threshold,
            batch_size=ns.batch_size,
            frame_limit=ns.frame_limit,
            print_every=ns.print_every,
            decode_workers=ns.decode_workers,
            decoder=ns.decoder,
            decode_process={"auto": "auto", "on": True,
                            "off": False}[ns.decode_process],
            transfer=ns.transfer,
            device_resize=ns.device_resize,
            pallas_preprocess=ns.pallas_preprocess,
            cache_path=ns.cache_scores,
            precision=ns.precision,
            device_glue=ns.device_glue,
        )
    return out_path


if __name__ == "__main__":
    main()
