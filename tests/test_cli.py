"""CLI-level tests (arg parsing, export tool, split_video)."""

import os

import numpy as np
import pytest


def test_segment_video_parser_defaults():
    from cut_detection_tpu.cli.segment_video import build_parser

    ns = build_parser().parse_args(["video.mp4"])
    # Reference defaults (segment_video.py:84-120).
    assert ns.output_path is None
    assert ns.base_threshold == 100
    assert ns.blank_threshold == 10
    assert ns.batch_size == 128
    assert ns.print_every == 50
    assert ns.frame_limit is None
    assert not ns.cpu
    # TPU-era extensions default to reference-equivalent behavior.
    assert ns.decode_workers == 1
    assert not ns.device_resize
    assert ns.precision == "float32"


def test_argfile_support(tmp_path):
    from cut_detection_tpu.cli.segment_video import build_parser

    argfile = tmp_path / "args.txt"
    argfile.write_text("video.mp4\n--batch-size\n64\n")
    ns = build_parser().parse_args([f"@{argfile}"])
    assert ns.input_path == "video.mp4"
    assert ns.batch_size == 64


def test_split_video_cli(tmp_path, synthetic_video):
    from cut_detection_tpu.cli.split_video import main

    out = tmp_path / "frames"
    main([synthetic_video, str(out), "--max-frames", "10", "--resize", "128"])
    files = sorted(os.listdir(out))
    assert files[0] == "frame_0000000.jpg"
    assert len(files) == 10
    import cv2

    img = cv2.imread(str(out / files[0]))
    assert img.shape[1] == 128  # resized width (split_video.py:35-38 rule)


def test_split_video_parallel_matches(tmp_path, synthetic_video):
    from cut_detection_tpu.cli.split_video import main
    import cv2

    a = tmp_path / "seq"
    b = tmp_path / "par"
    main([synthetic_video, str(a), "--max-frames", "20"])
    main([synthetic_video, str(b), "--max-frames", "20",
          "--decode-workers", "3"])
    for f in sorted(os.listdir(a))[:20]:
        ia = cv2.imread(str(a / f))
        ib = cv2.imread(str(b / f))
        np.testing.assert_array_equal(ia, ib)


def test_export_model_stablehlo(tmp_path):
    from cut_detection_tpu.cli.export_model import main

    out = str(tmp_path / "prod.stablehlo")
    path = main(["--use-default-net", "--output", out,
                 "--batch-size", "2", "--height", "72", "--width", "96"])
    assert path == out
    assert os.path.getsize(out) > 1000

    # Round-trip through the serialized artifact.
    import jax

    with open(out, "rb") as f:
        exported = jax.export.deserialize(f.read())
    x = np.random.default_rng(0).random((2, 72, 96, 3), dtype=np.float32)
    logits = np.asarray(exported.call(x))
    from cut_detection_tpu.models.assembly import load_default_net

    net, _ = load_default_net()
    np.testing.assert_allclose(logits, np.asarray(net(x)), atol=1e-5)


def test_export_model_flax(tmp_path):
    """--format flax emits a msgpack checkpoint the linen GluedClassifier
    reproduces the prod logits from (the flax interop's shipped path)."""
    pytest.importorskip("flax")
    from cut_detection_tpu.cli.export_model import main

    out = str(tmp_path / "fexport")
    path = main(["--use-default-net", "--format", "flax", "--output", out,
                 "--batch-size", "2", "--height", "72", "--width", "96"])
    assert path == out
    assert os.path.getsize(os.path.join(out, "variables.msgpack")) > 10000

    from flax import serialization

    from cut_detection_tpu.config import ModelParams
    from cut_detection_tpu.models.assembly import load_default_net
    from cut_detection_tpu.models.flax_module import (
        GluedClassifier,
        bundle_to_variables,
    )

    mp = ModelParams.from_json(os.path.join(out, "model_params.json"))
    net, _ = load_default_net()
    template = bundle_to_variables(net.bundle)
    with open(os.path.join(out, "variables.msgpack"), "rb") as f:
        variables = serialization.from_bytes(template, f.read())
    x = np.random.default_rng(1).random((2, 72, 96, 3), dtype=np.float32)
    logits = np.asarray(GluedClassifier(mp).apply(variables, x))
    np.testing.assert_allclose(logits, np.asarray(net(x)), atol=1e-5)


def test_export_model_torch(tmp_path, torch):
    from cut_detection_tpu.cli.export_model import main

    out = str(tmp_path / "texport")
    main(["--use-default-net", "--format", "torch", "--output", out])
    conv_sd = torch.load(os.path.join(out, "classifier_conv.pt"),
                         weights_only=True)
    assert "conv_layers.0.conv.weight" in conv_sd
    assert tuple(conv_sd["conv_layers.0.conv.weight"].shape) == (48, 3, 3, 3)


def test_segment_videos_cli(synthetic_video, tmp_path, monkeypatch):
    import shutil

    from cut_detection_tpu.cli.segment_videos import main

    a = str(tmp_path / "a.mp4")
    b = str(tmp_path / "b.mp4")
    shutil.copy(synthetic_video, a)
    shutil.copy(synthetic_video, b)
    outs = main([a, b, "--batch-size", "64"])
    assert len(outs) == 2
    assert all(os.path.isfile(o) for o in outs)
    with open(outs[0], "rb") as f0, open(outs[1], "rb") as f1:
        assert f0.read() == f1.read()

    import jax

    if len(jax.devices()) >= 8:
        # Mesh-sharded variant must produce the identical CSVs.
        c = str(tmp_path / "c.mp4")
        shutil.copy(synthetic_video, c)
        outs_dp = main([c, "--batch-size", "64", "--data-parallel"])
        with open(outs[0], "rb") as f0, open(outs_dp[0], "rb") as f1:
            assert f0.read() == f1.read()

    from cut_detection_tpu.data import native_video as nv

    if nv.yuv_available():
        # The 1.5 B/px transfer mode runs through the batch CLI too
        # (accuracy-gated fast path; determinism asserted, not BGR
        # equality — see test_yuv.py for why).
        d = str(tmp_path / "d.mp4")
        e = str(tmp_path / "e.mp4")
        shutil.copy(synthetic_video, d)
        shutil.copy(synthetic_video, e)
        outs_yuv = main([d, e, "--batch-size", "64", "--transfer", "yuv420"])
        assert all(os.path.isfile(o) for o in outs_yuv)
        with open(outs_yuv[0], "rb") as f0, open(outs_yuv[1], "rb") as f1:
            assert f0.read() == f1.read()


def test_labelling_storage(tmp_path):
    from cut_detection_tpu.cli.labelling import get_labels, write_label

    assert get_labels(str(tmp_path)) == {}
    labels = write_label(str(tmp_path), {}, 7, "EZ")
    assert labels == {"7": "EZ"}
    assert get_labels(str(tmp_path)) == {"7": "EZ"}


def test_init_devices_timeout_and_passthrough(monkeypatch):
    """init_devices: unbounded without config; TimeoutError when
    CUTDET_INIT_TIMEOUT is set and init hangs; passthrough when fast."""
    import sys
    import time
    import types

    from cut_detection_tpu.utils import platform as plat

    # Fast path: real (forced-CPU) jax returns devices.
    assert len(plat.init_devices()) >= 1
    monkeypatch.setenv("CUTDET_INIT_TIMEOUT", "0.2")
    assert len(plat.init_devices()) >= 1

    # Hang path: stub jax whose devices() sleeps past the bound.
    hang = types.ModuleType("jax")
    hang.devices = lambda: time.sleep(5)
    monkeypatch.setitem(sys.modules, "jax", hang)
    with pytest.raises(TimeoutError, match="wedged"):
        plat.init_devices()

    # Init errors propagate as themselves, not TimeoutError.
    def boom():
        raise RuntimeError("backend exploded")

    hang.devices = boom
    with pytest.raises(RuntimeError, match="exploded"):
        plat.init_devices()


def test_init_devices_malformed_timeout_env(monkeypatch):
    """Empty or non-numeric CUTDET_INIT_TIMEOUT must not crash every CLI
    at startup — fall back to the caller's default bound."""
    from cut_detection_tpu.utils import platform as plat

    for bad in ("", "abc"):
        monkeypatch.setenv("CUTDET_INIT_TIMEOUT", bad)
        assert len(plat.init_devices()) >= 1          # default: unbounded
        assert len(plat.init_devices(default_timeout=30)) >= 1


def test_segment_video_cli_rejects_yuv_plus_device_resize(tmp_path):
    """ADVICE r4: the transfer/device-resize mutual exclusion surfaces at
    parse time (SystemExit 2), not as a ValueError after model load."""
    import pytest as _pytest

    from cut_detection_tpu.cli.segment_video import main as sv_main
    from cut_detection_tpu.cli.segment_videos import main as svs_main

    with _pytest.raises(SystemExit) as ei:
        sv_main(["x.mp4", "--transfer", "yuv420", "--device-resize"])
    assert ei.value.code == 2
    with _pytest.raises(SystemExit) as ei:
        sv_main(["x.mp4", "--transfer", "yuv420", "--pallas-preprocess"])
    assert ei.value.code == 2
    with _pytest.raises(SystemExit) as ei:
        svs_main(["x.mp4", "--transfer", "yuv420", "--device-resize"])
    assert ei.value.code == 2


def test_segment_video_cli_transfer_default_is_auto():
    from cut_detection_tpu.cli.segment_video import build_parser
    from cut_detection_tpu.cli.segment_videos import (
        build_parser as batch_parser,
    )

    assert build_parser().parse_args(["x.mp4"]).transfer == "auto"
    assert batch_parser().parse_args(["x.mp4"]).transfer == "auto"
    # auto + --device-resize is fine: it resolves to bgr downstream.
    ns = build_parser().parse_args(["x.mp4", "--device-resize"])
    assert ns.transfer == "auto"
