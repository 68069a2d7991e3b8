"""ops/yuv.py: on-device YUV420->BGR vs the live-swscale oracle.

The pipeline's yuv420 transfer mode uploads 1.5 B/px planar YUV and
converts on device; these tests pin that the device op is BIT-EXACT
with swscale's same-size converter (native/video_decoder.cpp
``vd_yuv420_to_bgr24`` — the same library whose BGR output is pinned
byte-identical to cv2), across random images, odd geometries, and the
full constant-derivation (all four channel tables + a large exhaustive
sweep, scripts/derive_yuv_constants.py).
"""

import numpy as np
import pytest

from cut_detection_tpu.data import native_video
from cut_detection_tpu.ops.yuv import (
    _tables_np,
    pack_yuv420,
    yuv420_nbytes,
    yuv420_to_bgr,
    yuv420_to_bgr_np,
)

needs_native_yuv = pytest.mark.skipif(
    not native_video.yuv_available(),
    reason="native decoder with YUV entry points not built")


def _random_planes(rng, h, w):
    cw, ch = (w + 1) // 2, (h + 1) // 2
    y = rng.integers(0, 256, (h, w), dtype=np.uint8)
    u = rng.integers(0, 256, (ch, cw), dtype=np.uint8)
    v = rng.integers(0, 256, (ch, cw), dtype=np.uint8)
    return y, u, v


@needs_native_yuv
@pytest.mark.parametrize("h,w", [(144, 256), (36, 64), (90, 160),
                                 (192, 256), (146, 254)])
def test_device_op_bit_exact_vs_swscale(h, w):
    rng = np.random.default_rng(h * 1000 + w)
    y, u, v = _random_planes(rng, h, w)
    want = native_video.yuv420_to_bgr24_host(y, u, v)
    flat = pack_yuv420(y, u, v)
    assert flat.shape[0] == yuv420_nbytes(h, w)
    got = np.asarray(yuv420_to_bgr(flat[None], h, w))[0]
    np.testing.assert_array_equal(got, want)
    # numpy twin identical to the jax op
    np.testing.assert_array_equal(yuv420_to_bgr_np(flat, h, w), got)


@needs_native_yuv
def test_shipped_tables_match_live_swscale():
    """Re-extract the per-channel integer tables from the live swscale
    and compare with the shipped closed forms — the canary that fails
    loudly if a future ffmpeg changes its converter."""
    tabs = _tables_np()
    rng = np.random.default_rng(0)
    # Spot-extract via dense sweeps: for each channel, a (Y x C) grid.
    Y = np.tile(np.arange(256, dtype=np.uint8), (512, 2))
    cr = np.arange(256, dtype=np.uint8)[:, None].repeat(256, 1)
    mid = np.full((256, 256), 128, np.uint8)
    oU = native_video.yuv420_to_bgr24_host(Y, cr, mid)
    oV = native_video.yuv420_to_bgr24_host(Y, mid, cr)
    yy = np.arange(256, dtype=np.int64)
    # B(y, u) = clip(ly[y] + bu[u]) etc.
    for M, lut in ((oU[::2, :256, 0], tabs["ly"][None, :] + tabs["bu"][:, None]),
                   (oU[::2, :256, 1], tabs["ly"][None, :] + tabs["gu"][:, None]
                    + tabs["gv"][128]),
                   (oV[::2, :256, 2], tabs["ly"][None, :] + tabs["rv"][:, None]),
                   (oV[::2, :256, 1], tabs["ly"][None, :] + tabs["gv"][:, None]
                    + tabs["gu"][128])):
        np.testing.assert_array_equal(np.clip(lut, 0, 255),
                                      M.astype(np.int64))
    del rng, yy


@needs_native_yuv
def test_random_image_sweep_exact():
    rng = np.random.default_rng(7)
    for _ in range(20):
        h = 2 * int(rng.integers(4, 100))
        w = 2 * int(rng.integers(4, 160))
        y, u, v = _random_planes(rng, h, w)
        want = native_video.yuv420_to_bgr24_host(y, u, v)
        got = yuv420_to_bgr_np(pack_yuv420(y, u, v), h, w)
        np.testing.assert_array_equal(got, want)


def test_odd_dims_rejected():
    """Odd geometries take swscale's interpolating generic path — the
    device op refuses them (the pipeline falls back to BGR transfer)."""
    import jax.numpy as jnp

    with pytest.raises(ValueError, match="even dims"):
        yuv420_to_bgr(jnp.zeros((1, yuv420_nbytes(145, 256)), jnp.uint8),
                      145, 256)


@needs_native_yuv
def test_native_yuv_source_shapes(synthetic_video):
    src = native_video.NativeYUVSource(synthetic_video, resize=256)
    assert (src.out_width, src.out_height) == (256, 144)
    n = 0
    first = None
    for f in src:
        if first is None:
            first = f
        n += 1
    assert n == 240 and src.frames_failed == 0
    assert first.shape == (yuv420_nbytes(144, 256),)
    src.close()


@needs_native_yuv
def test_yuv_seek_matches_sequential(synthetic_video):
    """NativeYUVSource.seek positions exactly: the vector after a seek
    byte-equals the sequentially-decoded one (chunk-decode prerequisite)."""
    seq = native_video.NativeYUVSource(synthetic_video, resize=256)
    want = {}
    for i, f in enumerate(seq):
        if i in (0, 67, 128, 239):
            want[i] = f.copy()
    seq.close()
    src = native_video.NativeYUVSource(synthetic_video, resize=256)
    for i in (67, 0, 239, 128):
        src.seek(i)
        np.testing.assert_array_equal(next(src), want[i], err_msg=f"frame {i}")
    src.close()


@needs_native_yuv
@pytest.mark.parametrize("threads", [2, 4])
def test_yuv_chunk_parallel_matches_sequential(synthetic_video, threads):
    """ParallelVideoReader(backend='yuv') reproduces the sequential YUV
    vector stream byte-for-byte (seek-verified chunked decode)."""
    from cut_detection_tpu.data.video import ParallelVideoReader

    seq = list(native_video.NativeYUVSource(synthetic_video, resize=256))
    par = ParallelVideoReader(synthetic_video, resize=256,
                              num_threads=threads, chunk_frames=64,
                              backend="yuv")
    got = list(par)
    assert len(got) == len(seq) == 240
    for i, (a, b) in enumerate(zip(got, seq)):
        np.testing.assert_array_equal(a, b, err_msg=f"frame {i}")
    assert par.frames_failed == 0


@needs_native_yuv
def test_pipeline_yuv_chunked_decode_same_csv(synthetic_video, tmp_path):
    """segment_video_file with transfer='yuv420' produces the same CSV
    with chunk-parallel decode as with the sequential YUV decoder, both
    through the subprocess loader and in-process."""
    from cut_detection_tpu.pipeline import segment_video_file

    outs = {}
    for name, kw in {
        "seq": dict(decode_workers=1, decode_process=False),
        "par": dict(decode_workers=3, decode_process=False),
        "par_proc": dict(decode_workers=3, decode_process=True),
    }.items():
        p = str(tmp_path / f"{name}.csv")
        segment_video_file(synthetic_video, p, transfer="yuv420",
                           print_every=0, **kw)
        outs[name] = open(p, "rb").read()
    assert outs["seq"] == outs["par"] == outs["par_proc"]


@needs_native_yuv
def test_yuv_source_composition_close_to_reference_path(synthetic_video):
    """YUV-space resize differs from the reference's BGR-space cv2
    resize by small per-pixel amounts only (the classify gates live in
    test_pipeline/test_eval_corpus; this pins the input-domain bound)."""
    from cut_detection_tpu.data.video import VideoFrameSource

    yuv_src = native_video.NativeYUVSource(synthetic_video, resize=256)
    bgr_src = VideoFrameSource(synthetic_video, resize=256)
    diffs = []
    for i, (fy, fb) in enumerate(zip(yuv_src, bgr_src)):
        got = yuv420_to_bgr_np(fy, 144, 256)
        diffs.append(np.abs(got.astype(int) - fb.astype(int)).max())
        if i >= 10:
            break
    yuv_src.close()
    # Strong-color synthetic frames: the two resize spaces agree within
    # a small bound (chroma subsampling + rounding).  Large values mean
    # a colorspace/range mismatch crept in.
    assert max(diffs) <= 40, diffs


@needs_native_yuv
def test_pipeline_yuv_transfer_matches_host_oracle(synthetic_video):
    """The yuv420 pipeline (flat planes in, device convert, classify) is
    byte-identical to the host-oracle composition of its own parts
    (NativeYUVSource -> yuv420_to_bgr_np -> classify step), for BOTH
    decode paths — the wiring test that is content-independent.

    (CSV-vs-BGR-path equality is deliberately NOT asserted on synthetic
    fixtures: near-black uniform noise sits on a steep decision surface
    of the prod net — +1 brightness moves logits ~0.4 — so the resize-
    space change flips such out-of-distribution frames.  The accuracy
    gate for real content lives in test_eval_corpus.py.)"""
    import jax

    from cut_detection_tpu.data.video import batch_frames
    from cut_detection_tpu.models.assembly import load_default_net
    from cut_detection_tpu.pipeline import classify_video, make_classify_step

    net, _ = load_default_net()
    # Host oracle: same source, host-side conversion, plain BGR step.
    src = native_video.NativeYUVSource(synthetic_video, resize=256)
    step = make_classify_step(net)
    confs, preds = [], []
    for batch, valid in batch_frames(src, 32):
        bgr = yuv420_to_bgr_np(batch, 144, 256)
        c, p = step(net.bundle, bgr)
        confs.append(np.asarray(jax.device_get(c))[:valid])
        preds.append(np.asarray(jax.device_get(p))[:valid])
    want_c = np.concatenate(confs)
    want_p = np.concatenate(preds)

    a = classify_video(synthetic_video, net, batch_size=32, print_every=0,
                       transfer="yuv420", decode_process=False)
    b = classify_video(synthetic_video, net, batch_size=32, print_every=0,
                       transfer="yuv420", decode_process=True)
    np.testing.assert_array_equal(a[1], want_p)
    np.testing.assert_array_equal(b[1], want_p)
    np.testing.assert_array_equal(a[0], want_c)
    np.testing.assert_array_equal(b[0], want_c)


@needs_native_yuv
def test_pipeline_yuv_transfer_odd_height_falls_back(tmp_path):
    """An odd target height routes through swscale's interpolating path —
    the pipeline must fall back to BGR transfer (logged), not mis-emulate."""
    import cv2

    from cut_detection_tpu.pipeline import classify_video, segment_video_file

    # 630x354 -> width 256, height int(354*256/630) = 143 (odd).
    path = str(tmp_path / "odd.mp4")
    wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30,
                         (630, 354))
    rng = np.random.default_rng(3)
    base = np.full((354, 630, 3), (40, 120, 40), np.uint8)
    for _ in range(40):
        wr.write(cv2.add(base, rng.integers(0, 30, (354, 630, 3),
                                            dtype=np.uint8)))
    wr.release()
    out_y = tmp_path / "odd_yuv.csv"
    out_b = tmp_path / "odd_bgr.csv"
    segment_video_file(path, str(out_y), print_every=0, transfer="yuv420")
    segment_video_file(path, str(out_b), print_every=0)
    # Fallback means byte-identical to the BGR path, not merely close.
    assert out_y.read_bytes() == out_b.read_bytes()
    del classify_video


def test_pipeline_yuv_rejects_device_resize(synthetic_video):
    from cut_detection_tpu.pipeline import classify_video

    with pytest.raises(ValueError, match="yuv420"):
        classify_video(synthetic_video, transfer="yuv420",
                       device_resize=True, print_every=0)


@needs_native_yuv
def test_derivation_script_verifies_exhaustively():
    """Run the full constant derivation incl. the 2^24 sweep (the
    authoritative bit-exactness certificate, ~15 s)."""
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "scripts/derive_yuv_constants.py"],
        capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "exhaustive 2^24 check: 0 mismatching bytes" in out.stdout
