"""Minimal HTTP serving daemon for the segmentation pipeline.

The reference ships only a batch Docker ENTRYPOINT (Dockerfile:36).  For
production serving this daemon keeps the model loaded and the classify
step compiled, processing one video per request (videos are local paths —
the deployment contract mounts media under a shared volume, like the
reference's ``-v $(OUTPUT_LOC):/home/sources`` runner, Makefile:20-24).

API (stdlib http.server; no extra dependencies):

- ``GET  /healthz``                      -> {"status": "ok", ...}
- ``POST /segment`` body {"input_path": ..., optional "output_path",
  "base_threshold", "blank_threshold", "batch_size", "frame_limit",
  "decode_workers"}    -> {"output_path", "segments": [[start, label],
  ...], "stats": {...}}

Requests are serialized through a lock — the device is a single-program
resource; concurrency belongs at the batch level, not the request level.
"""

from __future__ import annotations

import argparse
import json
import logging
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from cut_detection_tpu.utils.logging import setup_logging

logger = logging.getLogger(__name__)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("Serve the segmentation pipeline over HTTP.")
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8571)
    p.add_argument("--precision",
                   choices=["float32", "bfloat16", "bfloat16_full"],
                   default="float32")
    p.add_argument("--model-dir", type=str, default=None,
                   help="Serve a trained triplet instead of the bundled "
                        "prod classifier.")
    p.add_argument("--model-name", type=str, default="init_model")
    p.add_argument("--cpu", action="store_true")
    return p


class _State:
    net = None
    precision = "float32"
    lock = threading.Lock()
    requests_served = 0


def _make_handler(state: _State):
    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, fmt, *args):  # route through logging
            logger.info("%s - %s", self.address_string(), fmt % args)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, {
                    "status": "ok",
                    "requests_served": state.requests_served,
                    "precision": state.precision,
                })
            else:
                self._reply(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/segment":
                self._reply(404, {"error": "not found"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
                input_path = req["input_path"]
            except (KeyError, ValueError) as e:
                self._reply(400, {"error": f"bad request: {e}"})
                return

            from cut_detection_tpu.pipeline import segment_video_file

            kwargs = {
                k: req[k] for k in (
                    "output_path", "base_threshold", "blank_threshold",
                    "batch_size", "frame_limit", "decode_workers",
                ) if k in req
            }
            output_path = kwargs.pop("output_path", None)
            try:
                with state.lock:
                    out, seg, stats = segment_video_file(
                        input_path, output_path, net=state.net,
                        print_every=0, **kwargs)
                    state.requests_served += 1
            except ValueError as e:
                self._reply(400, {"error": str(e)})
                return
            except Exception as e:  # pragma: no cover - defensive
                logger.exception("segment failed")
                self._reply(500, {"error": f"{type(e).__name__}: {e}"})
                return

            from cut_detection_tpu.segmentation.rle import INVERSE_LAB_ENUM

            segments = [
                [int(sf), INVERSE_LAB_ENUM[int(tp)]]
                for sf, tp in zip(seg.te["start_frames"],
                                  seg.te["frame_types"])
            ]
            self._reply(200, {
                "output_path": out,
                "segments": segments,
                "stats": {
                    "frames": stats.frames,
                    "batches": stats.batches,
                    "decode_failures": stats.decode_failures,
                    "frames_per_sec": round(stats.frames_per_sec, 2),
                },
            })

    return Handler


def make_server(host: str, port: int, precision: str = "float32",
                model_dir: str | None = None,
                model_name: str = "init_model"):
    """Build (server, state) with the model preloaded."""
    from cut_detection_tpu.models.assembly import load_triplet_or_default

    state = _State()
    state.precision = precision
    state.net, _ = load_triplet_or_default(model_dir, model_name,
                                           precision=precision)
    server = ThreadingHTTPServer((host, port), _make_handler(state))
    return server, state


def main(args=None) -> None:
    ns = build_parser().parse_args(args)
    setup_logging()

    from cut_detection_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax

    if ns.cpu:
        from cut_detection_tpu.utils.platform import force_cpu

        force_cpu()
    logging.info("Using %s", jax.devices()[0].platform)

    server, _ = make_server(ns.host, ns.port, ns.precision,
                            model_dir=ns.model_dir, model_name=ns.model_name)
    logging.info("Serving on %s:%d", ns.host, ns.port)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass


if __name__ == "__main__":
    main()
