"""Installation / device-health diagnostic (``cutdet-doctor``).

The reference has no equivalent — its failure mode is a Python traceback
deep inside cv2 or torch.  On a TPU VM (or any tunneled/remote device
path) the checks an operator actually needs, in dependency order:

1. backend init completes *in bounded time* (a wedged tunnel HANGS
   ``jax.devices()`` forever rather than raising — observed live),
2. a tiny on-device computation round-trips (init alone can succeed on
   a relay whose execution path is stuck),
3. the bundled checkpoint loads and classifies at the serving shape
   (``--full`` — pays a compile on a cold cache),
4. host-side decode works (cv2 + the first-party libav decoder),
5. the native host library is present.

Each check prints ``ok`` / ``FAIL`` with a latency; the process exits 0
when everything required passed, 1 otherwise — so a deploy script or
restart supervisor can gate on it.  ``--json`` emits one machine-
readable line instead.

Bounds come from ``CUTDET_INIT_TIMEOUT`` (default here: 120 s) and
``--timeout`` for the compute probes; a hang is reported as a failed
check, never as a hung doctor.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        "Diagnose a cut_detection_tpu installation / device path.")
    p.add_argument("--timeout", type=float, default=120.0,
                   help="Per-check wall-clock bound in seconds "
                        "(backend init also honors CUTDET_INIT_TIMEOUT).")
    p.add_argument("--full", action="store_true",
                   help="Also compile + run the serving-shape classify "
                        "step (minutes on a cold compilation cache; this "
                        "check's bound is max(--timeout, 600s) so a "
                        "legitimate cold compile doesn't false-fail).")
    p.add_argument("--json", action="store_true",
                   help="Emit one JSON line instead of human-readable "
                        "check output.")
    p.add_argument("--cpu", action="store_true",
                   help="Force the CPU backend (diagnose host-side "
                        "pieces when no device is attached).")
    return p


def _check(name: str, fn, results: list, required: bool = True) -> bool:
    t0 = time.perf_counter()
    try:
        detail = fn()
        ok = True
        err = None
    except Exception as e:  # noqa: BLE001 — every fault is a finding here
        detail = None
        ok = False
        err = f"{type(e).__name__}: {e}"[:300]
    dt = time.perf_counter() - t0
    results.append({"check": name, "ok": ok, "seconds": round(dt, 2),
                    "detail": detail, "error": err, "required": required})
    return ok


def _backend_init(timeout: float):
    # bounded_call directly (not init_devices): the doctor's explicit
    # --timeout must win — init_devices gives CUTDET_INIT_TIMEOUT
    # precedence, and a machine-wide 1500 s setting would silently turn
    # a fast supervisor gate into a 25-minute hang.
    from cut_detection_tpu.utils.platform import bounded_call

    def init():
        import jax

        return jax.devices()

    devices = bounded_call(init, timeout, "backend init")
    return {"platform": devices[0].platform, "devices": len(devices)}


def _device_compute(timeout: float):
    from cut_detection_tpu.utils.platform import bounded_call

    def probe():
        import jax.numpy as jnp

        # A value FETCH — through a relay, only a fetch proves the
        # execution path works end to end.
        return float(jnp.arange(8.0).sum())

    value = bounded_call(probe, timeout, "device compute probe")
    if value != 28.0:
        raise ValueError(f"device returned {value}, expected 28.0")
    return {"roundtrip": "ok"}


def _classify_step(timeout: float):
    from cut_detection_tpu.utils.platform import bounded_call

    def probe():
        import numpy as np

        from cut_detection_tpu.models.assembly import load_default_net
        from cut_detection_tpu.pipeline import make_classify_step

        net, _ = load_default_net()
        step = make_classify_step(net)
        conf, pred = step(net.bundle,
                          np.zeros((8, 144, 256, 3), np.uint8))
        np.asarray(conf), np.asarray(pred)
        return {"params": net.num_params()}

    return bounded_call(probe, timeout, "classify step")


def _decode_cv2():
    import cv2
    import numpy as np
    import tempfile

    # Unique probe path (concurrent doctors — a cron gate plus a manual
    # run — must not race on one file), always cleaned up.
    fd, path = tempfile.mkstemp(prefix="cutdet_doctor_", suffix=".mp4")
    os.close(fd)
    try:
        wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30,
                             (64, 36))
        for _ in range(3):
            wr.write(np.zeros((36, 64, 3), np.uint8))
        wr.release()
        from cut_detection_tpu.data.video import VideoFrameSource

        frames = sum(1 for _ in VideoFrameSource(path, resize=None))
    finally:
        try:
            os.unlink(path)
        except OSError:
            pass
    if frames != 3:
        raise ValueError(f"decoded {frames} frames, expected 3")
    return {"cv2": cv2.__version__}


def _decoder_native():
    from cut_detection_tpu.data import native_video

    if not native_video.available():
        raise RuntimeError("native libav decoder not built "
                           "(make -C native)")
    return {"native_decoder": "available"}


def _native_lib():
    from cut_detection_tpu import native

    if not native.available():
        raise RuntimeError("cutdet_native library not built "
                           "(make -C native)")
    return {"native": "available"}


def main(args=None) -> None:
    parser = build_parser()
    ns = parser.parse_args(args)
    if ns.timeout <= 0:
        # init_devices treats <=0 as "unbounded" while bounded_call
        # would fail instantly — neither is what anyone means; reject.
        parser.error("--timeout must be positive")
    from cut_detection_tpu.utils.logging import setup_logging

    setup_logging()
    if ns.cpu:
        from cut_detection_tpu.utils.platform import force_cpu

        force_cpu()

    results: list = []
    init_ok = _check("backend-init", lambda: _backend_init(ns.timeout),
                     results)
    if init_ok:
        compute_ok = _check("device-compute",
                            lambda: _device_compute(ns.timeout), results)
        if compute_ok and ns.full:
            # A cold-cache compile legitimately takes minutes; a 120 s
            # default bound would false-fail the documented warm-up use
            # (and kill the compile mid-flight, risking a stale claim).
            _check("classify-step",
                   lambda: _classify_step(max(ns.timeout, 600.0)),
                   results)
    _check("decode-cv2", _decode_cv2, results)
    # Optional accelerations: their absence is a warning, not a failure
    # (the cv2 + numpy paths are complete fallbacks).
    _check("decoder-native", _decoder_native, results, required=False)
    _check("native-lib", _native_lib, results, required=False)

    healthy = all(r["ok"] for r in results if r["required"])
    if ns.json:
        print(json.dumps({"healthy": healthy, "checks": results}))
    else:
        for r in results:
            mark = "ok  " if r["ok"] else ("warn" if not r["required"]
                                           else "FAIL")
            line = f"[{mark}] {r['check']:16s} {r['seconds']:7.2f}s"
            if r["detail"]:
                line += f"  {r['detail']}"
            if r["error"]:
                line += f"  {r['error']}"
            print(line)
        print("healthy" if healthy else "UNHEALTHY")
    sys.exit(0 if healthy else 1)


if __name__ == "__main__":
    main()
