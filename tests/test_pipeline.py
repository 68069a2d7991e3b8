"""End-to-end pipeline golden tests: MP4 in, segments CSV out.

Runs the reference's segment_video main() (imported from /root/reference,
torch CPU) and our pipeline on the same synthetic video and asserts the CSVs
are byte-identical — the north-star correctness bar (BASELINE.md).
"""

import argparse
import os

import numpy as np
import pytest

from tests.conftest import import_reference, reference_available

from cut_detection_tpu.pipeline import classify_video, segment_video_file


def _run_reference(synthetic_video, out_path, frame_limit=None):
    ref_main = import_reference("segment_video")
    args = argparse.Namespace(
        input_path=synthetic_video,
        output_path=out_path,
        base_threshold=100,
        blank_threshold=10,
        batch_size=64,
        print_every=0,
        frame_limit=frame_limit,
        cpu=True,
    )
    ref_main.main(args)


@reference_available
def test_csv_byte_parity(synthetic_video, tmp_path):
    ref_csv = str(tmp_path / "ref.csv")
    our_csv = str(tmp_path / "ours.csv")
    _run_reference(synthetic_video, ref_csv)
    segment_video_file(synthetic_video, our_csv, batch_size=64)
    with open(ref_csv, "rb") as f:
        ref_bytes = f.read()
    with open(our_csv, "rb") as f:
        our_bytes = f.read()
    assert ref_bytes == our_bytes
    assert b"\r\n" in ref_bytes  # formatting really is the reference's


@reference_available
def test_csv_byte_parity_device_resize(synthetic_video, tmp_path):
    """Same, but resizing on 'device' (the cv2-exact XLA path)."""
    ref_csv = str(tmp_path / "ref.csv")
    our_csv = str(tmp_path / "ours.csv")
    _run_reference(synthetic_video, ref_csv)
    segment_video_file(synthetic_video, our_csv, batch_size=64,
                       device_resize=True)
    assert open(ref_csv, "rb").read() == open(our_csv, "rb").read()


@reference_available
def test_csv_byte_parity_odd_geometry(tmp_path, torch):
    """Non-16:9 source (854x480 -> resize height int(480*256/854)=143):
    odd resized height exercises the truncating height rule and a pool
    grid that doesn't divide evenly."""
    import cv2

    video = str(tmp_path / "odd.mp4")
    w, h = 854, 480
    writer = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"mp4v"), 30,
                             (w, h))
    rng = np.random.default_rng(11)
    for n, color in [(70, (50, 130, 50)), (9, (12, 12, 12)),
                     (80, (140, 60, 60)), (41, (70, 60, 130))]:
        base = np.full((h, w, 3), color, dtype=np.uint8)
        for _ in range(n):
            noise = cv2.resize(
                rng.integers(0, 25, (h // 6, w // 6, 3)).astype(np.uint8),
                (w, h), interpolation=cv2.INTER_NEAREST)
            writer.write(cv2.add(base, noise))
    writer.release()

    from cut_detection_tpu.ops.resize import reference_resize_dims

    assert reference_resize_dims(w, h, 256) == (256, 143)

    ref_csv = str(tmp_path / "ref.csv")
    our_csv = str(tmp_path / "ours.csv")
    _run_reference(video, ref_csv)
    segment_video_file(video, our_csv, batch_size=64, print_every=0)
    assert open(ref_csv, "rb").read() == open(our_csv, "rb").read()


@reference_available
def test_frame_limit_semantics(synthetic_video, tmp_path):
    """--frame-limit breaks after the batch that crosses the limit
    (segment_video.py:53-58)."""
    conf, pred, _ = classify_video(synthetic_video, batch_size=32,
                                   frame_limit=100, print_every=0)
    # Batches of 32: break once (i+1)*32 > 100 -> after batch i=3 -> 128.
    assert conf.shape[0] == 128

    ref_csv = str(tmp_path / "ref.csv")
    our_csv = str(tmp_path / "ours.csv")
    _run_reference(synthetic_video, ref_csv, frame_limit=100)
    segment_video_file(synthetic_video, our_csv, batch_size=64,
                       frame_limit=100)
    # Reference with bs=64: break once (i+1)*64 > 100 -> 128 frames too.
    assert open(ref_csv, "rb").read() == open(our_csv, "rb").read()


def test_prefetch_matches_unprefetched(synthetic_video):
    """The decode-ahead producer thread changes timing, not results —
    scores are identical with prefetch on (default) and off, including
    under the frame-limit early break (which must also stop the
    producer)."""
    a = classify_video(synthetic_video, batch_size=32, print_every=0,
                       prefetch_batches=2)
    b = classify_video(synthetic_video, batch_size=32, print_every=0,
                       prefetch_batches=0)
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])

    la = classify_video(synthetic_video, batch_size=32, frame_limit=50,
                        print_every=0, prefetch_batches=2)
    lb = classify_video(synthetic_video, batch_size=32, frame_limit=50,
                        print_every=0, prefetch_batches=0)
    np.testing.assert_array_equal(la[0], lb[0])


def test_decode_ahead_preloaded_matches(synthetic_video):
    """start_decode_ahead begins filling its bounded queue BEFORE any
    consumer runs (the serve daemon overlaps a queued request's decode
    with the in-flight request's device compute), and a preloaded
    classify produces identical scores to the direct path."""
    import time

    from cut_detection_tpu.pipeline import start_decode_ahead

    pre = start_decode_ahead(synthetic_video, batch_size=32)
    try:
        deadline = time.time() + 20
        while pre[1]._q.qsize() == 0 and time.time() < deadline:
            time.sleep(0.05)
        assert pre[1]._q.qsize() > 0  # produced with no consumer attached
        a = classify_video(synthetic_video, batch_size=32, print_every=0,
                           preloaded=pre)
    finally:
        pre[1].close()
    b = classify_video(synthetic_video, batch_size=32, print_every=0)
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])
    assert a[2].frames == b[2].frames


def test_decode_ahead_rejects_device_preprocess(synthetic_video):
    from cut_detection_tpu.pipeline import start_decode_ahead

    pre = start_decode_ahead(synthetic_video, batch_size=32)
    try:
        with pytest.raises(ValueError, match="preloaded decode"):
            classify_video(synthetic_video, batch_size=32, print_every=0,
                           device_resize=True, preloaded=pre)
    finally:
        pre[1].close()


def test_prefetch_loader_close_stops_producer():
    """PrefetchLoader.close() (and abandoning the iterator) stops the
    producer thread rather than decoding ahead forever."""
    import itertools
    import threading
    import time

    from cut_detection_tpu.data.loader import PrefetchLoader

    produced = []

    def gen():
        for i in itertools.count():
            produced.append(i)
            yield i

    loader = PrefetchLoader(gen(), depth=2)
    it = iter(loader)
    assert next(it) == 0
    loader.close()
    time.sleep(0.3)
    n = len(produced)
    time.sleep(0.3)
    assert len(produced) == n  # producer stopped
    assert threading.active_count() < 50


def test_prefetch_loader_is_single_use():
    """A second __iter__ raises instead of blocking forever on the
    already-drained queue (start() binds one producer to one queue)."""
    from cut_detection_tpu.data.loader import PrefetchLoader

    loader = PrefetchLoader(iter([1, 2, 3]), depth=2)
    assert [x for x in loader] == [1, 2, 3]
    with pytest.raises(RuntimeError, match="single-use"):
        iter(loader)


def test_parallel_decode_matches_sequential(synthetic_video):
    from cut_detection_tpu.data.video import (
        ParallelVideoReader,
        VideoFrameSource,
    )

    seq = list(VideoFrameSource(synthetic_video, resize=256))
    reader = ParallelVideoReader(synthetic_video, resize=256,
                                 num_threads=4, chunk_frames=37)
    par = list(reader)
    assert len(seq) == len(par)
    for a, b in zip(seq, par):
        np.testing.assert_array_equal(a, b)
    # The seek-integrity guard saw clean boundaries on an exact-seek codec.
    assert reader.seek_mismatches == 0


def test_parallel_decode_no_verify(synthetic_video):
    from cut_detection_tpu.data.video import (
        ParallelVideoReader,
        VideoFrameSource,
    )

    seq = list(VideoFrameSource(synthetic_video, resize=256))
    par = list(ParallelVideoReader(synthetic_video, resize=256,
                                   num_threads=3, chunk_frames=41,
                                   verify_seek=False))
    assert len(seq) == len(par)
    for a, b in zip(seq, par):
        np.testing.assert_array_equal(a, b)


def test_score_cache_roundtrip(synthetic_video, tmp_path):
    cache = str(tmp_path / "scores.npz")
    conf1, pred1, _ = classify_video(synthetic_video, batch_size=64,
                                     cache_path=cache, print_every=0)
    assert os.path.isfile(cache)
    conf2, pred2, stats = classify_video(synthetic_video, batch_size=64,
                                         cache_path=cache, print_every=0)
    np.testing.assert_array_equal(conf1, conf2)
    np.testing.assert_array_equal(pred1, pred2)
    assert stats.batches == 0  # served from cache


def test_score_cache_keyed_on_frame_limit(synthetic_video, tmp_path):
    """A frame-limited run writes a TRUNCATED cache; a later full run
    must recompute, not silently serve the short table (and vice versa:
    a full cache must not satisfy a limited request unsliced)."""
    cache = str(tmp_path / "scores.npz")
    conf_lim, _, _ = classify_video(synthetic_video, batch_size=32,
                                    frame_limit=40, cache_path=cache,
                                    print_every=0)
    assert conf_lim.shape[0] < 200  # actually truncated

    conf_full, _, stats = classify_video(synthetic_video, batch_size=32,
                                         cache_path=cache, print_every=0)
    assert stats.batches > 0  # recomputed, not served from the short cache
    assert conf_full.shape[0] > conf_lim.shape[0]

    # The full run overwrote the cache; a limited request recomputes.
    conf_lim2, _, stats = classify_video(synthetic_video, batch_size=32,
                                         frame_limit=40, cache_path=cache,
                                         print_every=0)
    assert stats.batches > 0
    np.testing.assert_array_equal(conf_lim, conf_lim2)

    # Same limit + same batch size IS served from cache; a different
    # batch size (different early-break frame count) is not.
    _, _, stats = classify_video(synthetic_video, batch_size=32,
                                 frame_limit=40, cache_path=cache,
                                 print_every=0)
    assert stats.batches == 0
    _, _, stats = classify_video(synthetic_video, batch_size=64,
                                 frame_limit=40, cache_path=cache,
                                 print_every=0)
    assert stats.batches > 0


def test_bf16_full_folded_pipeline_matches_f32(synthetic_video, tmp_path):
    """The perf mode (bf16_full + preprocess folded into conv1 weights)
    must produce the same CSV as strict float32 on the fixtures."""
    a = str(tmp_path / "bf16full.csv")
    b = str(tmp_path / "f32.csv")
    segment_video_file(synthetic_video, a, batch_size=64,
                       precision="bfloat16_full", print_every=0)
    segment_video_file(synthetic_video, b, batch_size=64, print_every=0)
    assert open(a, "rb").read() == open(b, "rb").read()


def test_device_glue_pipeline_matches_host(synthetic_video, tmp_path):
    a = str(tmp_path / "device.csv")
    b = str(tmp_path / "host.csv")
    segment_video_file(synthetic_video, a, batch_size=64, device_glue=True,
                       print_every=0)
    segment_video_file(synthetic_video, b, batch_size=64, print_every=0)
    assert open(a, "rb").read() == open(b, "rb").read()


def test_native_decoder_pipeline_matches_cv2(synthetic_video, tmp_path):
    from cut_detection_tpu.data import native_video

    if not native_video.available():
        pytest.skip("native decoder not built")
    a = str(tmp_path / "native.csv")
    b = str(tmp_path / "cv2.csv")
    segment_video_file(synthetic_video, a, batch_size=64, decoder="native",
                       print_every=0)
    segment_video_file(synthetic_video, b, batch_size=64, decoder="cv2",
                       print_every=0)
    assert open(a, "rb").read() == open(b, "rb").read()


def test_native_parallel_decode_matches(synthetic_video):
    from cut_detection_tpu.data import native_video
    from cut_detection_tpu.data.video import (
        ParallelVideoReader,
        VideoFrameSource,
    )

    if not native_video.available():
        pytest.skip("native decoder not built")
    seq = list(VideoFrameSource(synthetic_video, resize=256))
    par = list(ParallelVideoReader(synthetic_video, resize=256,
                                   num_threads=3, chunk_frames=41,
                                   backend="native"))
    assert len(seq) == len(par)
    for i, (a, b) in enumerate(zip(seq, par)):
        np.testing.assert_array_equal(a, b, err_msg=f"frame {i}")


def test_segment_many_reuses_model(synthetic_video, tmp_path):
    from cut_detection_tpu.pipeline import segment_many

    outs = [str(tmp_path / "a.csv"), str(tmp_path / "b.csv")]
    results = segment_many([synthetic_video, synthetic_video], outs,
                           batch_size=64, print_every=0)
    assert [r[0] for r in results] == outs
    assert open(outs[0], "rb").read() == open(outs[1], "rb").read()


def test_segment_many_rejects_mismatched_outputs(synthetic_video, tmp_path):
    """A shorter output list must fail fast, not IndexError mid-batch
    after some videos already segmented."""
    from cut_detection_tpu.pipeline import segment_many

    with pytest.raises(ValueError, match="output_paths"):
        segment_many([synthetic_video, synthetic_video],
                     [str(tmp_path / "only_one.csv")],
                     batch_size=64, print_every=0)
    assert not os.path.exists(tmp_path / "only_one.csv")  # nothing ran


def test_pipeline_sharded_over_mesh(synthetic_video, tmp_path):
    """classify step sharded over the 8-device CPU mesh == single device."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from cut_detection_tpu.parallel.mesh import make_mesh
    from cut_detection_tpu.pipeline import segment_video_file

    mesh = make_mesh(jax.devices()[:8])
    a = str(tmp_path / "mesh.csv")
    b = str(tmp_path / "single.csv")
    segment_video_file(synthetic_video, a, batch_size=64, mesh=mesh,
                       print_every=0)
    segment_video_file(synthetic_video, b, batch_size=64, print_every=0)
    assert open(a, "rb").read() == open(b, "rb").read()

    # The precision ladder composes with sharding: the fastest rung
    # (uint8_pool) over the mesh equals its own single-device output.
    au = str(tmp_path / "mesh_u8.csv")
    bu = str(tmp_path / "single_u8.csv")
    segment_video_file(synthetic_video, au, batch_size=64, mesh=mesh,
                       precision="uint8_pool", print_every=0)
    segment_video_file(synthetic_video, bu, batch_size=64,
                       precision="uint8_pool", print_every=0)
    assert open(au, "rb").read() == open(bu, "rb").read()


def test_pipeline_mesh_batch_divisibility(synthetic_video):
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from cut_detection_tpu.parallel.mesh import make_mesh
    from cut_detection_tpu.pipeline import classify_video

    mesh = make_mesh(jax.devices()[:8])
    with pytest.raises(ValueError, match="divide"):
        classify_video(synthetic_video, batch_size=30, mesh=mesh,
                       print_every=0)


def test_seek_mismatch_detected(synthetic_video, monkeypatch):
    """If a decoder returns different pixels after a seek (inexact-seek
    codec), the boundary guard must count and log it rather than let the
    stream silently diverge."""
    from cut_detection_tpu.data import video as V

    orig_seek = V._Cv2ChunkDecoder.seek
    orig_read = V._Cv2ChunkDecoder.read

    def fake_seek(self, idx):
        orig_seek(self, idx)
        self._just_sought = True

    def fake_read(self):
        f = orig_read(self)
        if getattr(self, "_just_sought", False) and f is not None:
            self._just_sought = False
            f = f.copy()
            f[0, 0, 0] ^= 1  # corrupt the first post-seek frame
        return f

    monkeypatch.setattr(V._Cv2ChunkDecoder, "seek", fake_seek)
    monkeypatch.setattr(V._Cv2ChunkDecoder, "read", fake_read)

    reader = V.ParallelVideoReader(synthetic_video, resize=None,
                                   num_threads=2, chunk_frames=50,
                                   heal_seek=False)
    frames = list(reader)
    assert len(frames) == reader.length
    assert reader.seek_mismatches >= 1


def test_async_dispatch_overlaps_host_work():
    """The pipeline's claim that async dispatch hides host decode behind
    device time, demonstrated: dispatch-then-decode interleaving beats
    decode-then-wait serial execution by a wide margin (VERDICT r1
    item 3).  Uses sleep for the 'decode' so host work takes no CPU and
    the overlap is attributable to async dispatch alone."""
    import time

    import jax
    import jax.numpy as jnp

    @jax.jit
    def heavy(x):
        for _ in range(4):
            x = jnp.tanh(x @ x)
        return x

    x = jnp.ones((600, 600), jnp.float32)
    np.asarray(heavy(x))  # compile + warm
    t0 = time.perf_counter()
    np.asarray(heavy(x))
    t_step = time.perf_counter() - t0
    n, sleep_s = 6, t_step

    t0 = time.perf_counter()
    for _ in range(n):  # serial: decode, then wait for the device
        time.sleep(sleep_s)
        np.asarray(heavy(x))
    serial = time.perf_counter() - t0

    t0 = time.perf_counter()
    outs = []
    for _ in range(n):  # pipelined: dispatch, decode while device runs
        outs.append(heavy(x))
        time.sleep(sleep_s)
    for o in outs:
        o.block_until_ready()
    overlapped = time.perf_counter() - t0

    # Perfect overlap would be ~0.5x serial (+1 step tail); 0.85 leaves
    # slack for a noisy shared host while still proving real overlap.
    # The shared 1-core host occasionally drifts 2x mid-test (documented
    # in docs/PERFORMANCE.md), which can swamp the signal — retry once
    # before declaring the overlap machinery broken.
    if overlapped >= 0.85 * serial:
        t0 = time.perf_counter()
        for _ in range(n):
            time.sleep(sleep_s)
            np.asarray(heavy(x))
        serial = time.perf_counter() - t0
        t0 = time.perf_counter()
        outs = []
        for _ in range(n):
            outs.append(heavy(x))
            time.sleep(sleep_s)
        for o in outs:
            o.block_until_ready()
        overlapped = time.perf_counter() - t0
    assert overlapped < 0.85 * serial, (overlapped, serial)


def test_seek_mismatch_heals_to_sequential(synthetic_video, monkeypatch):
    """Open-GOP-style corruption (garbage frames after every mid-stream
    seek) must be repaired: the healed parallel decode equals sequential
    decode byte-for-byte, not merely counted (VERDICT r1 item 2)."""
    from cut_detection_tpu.data import video as V

    seq = list(V.VideoFrameSource(synthetic_video, resize=None))

    orig_seek = V._Cv2ChunkDecoder.seek
    orig_read = V._Cv2ChunkDecoder.read

    def fake_seek(self, idx):
        orig_seek(self, idx)
        # Mid-stream seeks land without the prior GOP's reference frames:
        # the first few decoded frames come out wrong.  Seek to 0 (or a
        # fresh decoder) is the stream start and decodes cleanly.
        self._corrupt = 5 if idx > 0 else 0

    def fake_read(self):
        f = orig_read(self)
        if getattr(self, "_corrupt", 0) and f is not None:
            self._corrupt -= 1
            f = f.copy()
            f[0, 0, 0] ^= 1
        return f

    monkeypatch.setattr(V._Cv2ChunkDecoder, "seek", fake_seek)
    monkeypatch.setattr(V._Cv2ChunkDecoder, "read", fake_read)

    reader = V.ParallelVideoReader(synthetic_video, resize=None,
                                   num_threads=2, chunk_frames=50)
    frames = list(reader)
    assert reader.seek_mismatches >= 1
    assert reader.chunks_healed == reader.seek_mismatches
    assert len(frames) == len(seq)
    for i, (a, b) in enumerate(zip(frames, seq)):
        np.testing.assert_array_equal(a, b, err_msg=f"frame {i}")


def test_truncated_video_accounting(tmp_path):
    """A corrupt/truncated file decodes partially; the pipeline truncates
    like the reference (frameID/data.py:213-216) but ACCOUNTS for it.

    Uses an MJPG AVI (frames decode independently, so a cut tail loses only
    trailing frames while the header stays parseable).
    """
    import cv2

    path = str(tmp_path / "clip.avi")
    w, h = 128, 96
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 30,
                             (w, h))
    rng = np.random.default_rng(0)
    for _ in range(60):
        writer.write(rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8))
    writer.release()

    data = open(path, "rb").read()
    bad = tmp_path / "bad.avi"
    bad.write_bytes(data[: int(len(data) * 0.5)])
    from cut_detection_tpu.data.video import VideoFrameSource

    try:
        src = VideoFrameSource(str(bad), resize=None)
    except Exception:
        pytest.skip("container unreadable after truncation")
    if src.video_info["length"] <= 0:
        pytest.skip("container metadata lost by truncation")
    frames = list(src)
    assert len(frames) < src.video_info["length"]
    assert src.frames_failed == src.video_info["length"] - len(frames)


def test_default_output_naming(synthetic_video):
    out, seg, _ = segment_video_file(synthetic_video, batch_size=64,
                                     frame_limit=64)
    assert out == os.path.splitext(synthetic_video)[0] + "_segments.csv"
    assert os.path.isfile(out)
    assert len(seg) >= 1


def test_decode_ahead_mismatched_params_rejected(synthetic_video):
    """PreloadedDecode carries the batch_size/resize it was built with;
    classify_video refuses a mismatched handle (its frame_limit break
    math assumes the handle's batch size) and closes the loader."""
    from cut_detection_tpu.pipeline import start_decode_ahead

    pre = start_decode_ahead(synthetic_video, batch_size=32)
    with pytest.raises(ValueError, match="batch_size=32"):
        classify_video(synthetic_video, batch_size=64, print_every=0,
                       preloaded=pre)
    assert pre[1]._stop.is_set()  # rejecting call closed the producer


def test_decode_ahead_bare_tuple_rejected(synthetic_video):
    """A bare (source, loader) 2-tuple can't be validated (no recorded
    batch_size/resize), so classify_video rejects it loudly instead of
    letting a silent parameter mismatch corrupt the frame_limit math —
    and closes the loader on the way out."""
    from cut_detection_tpu.pipeline import start_decode_ahead

    pre = start_decode_ahead(synthetic_video, batch_size=32)
    with pytest.raises(TypeError, match="PreloadedDecode"):
        classify_video(synthetic_video, batch_size=32, print_every=0,
                       preloaded=(pre[0], pre[1]))
    assert pre[1]._stop.is_set()


def test_decode_ahead_closed_on_preprocess_reject(synthetic_video):
    """The on-device-preprocess rejection closes the producer too (a
    caller catching the ValueError must not leak a running decode
    pipeline)."""
    from cut_detection_tpu.pipeline import start_decode_ahead

    pre = start_decode_ahead(synthetic_video, batch_size=32)
    with pytest.raises(ValueError, match="preloaded decode"):
        classify_video(synthetic_video, batch_size=32, print_every=0,
                       device_resize=True, preloaded=pre)
    assert pre[1]._stop.is_set()


def test_decode_ahead_native_resolution_accepted(synthetic_video):
    """resize=None (native-resolution decode) is a valid preloaded
    configuration: the handle validation is an isinstance check, not a
    None-field sentinel, so segment_many(resize=None) keeps working
    with decode-ahead pipelining on."""
    from cut_detection_tpu.pipeline import start_decode_ahead

    pre = start_decode_ahead(synthetic_video, batch_size=32, resize=None)
    conf, pred, stats = classify_video(
        synthetic_video, batch_size=32, resize=None, print_every=0,
        preloaded=pre)
    conf2, pred2, _ = classify_video(
        synthetic_video, batch_size=32, resize=None, print_every=0)
    assert stats.frames == len(pred)
    np.testing.assert_array_equal(pred, pred2)
    np.testing.assert_array_equal(conf, conf2)


def test_prefetch_on_close_fires_exactly_once(synthetic_video):
    """PrefetchLoader's on_close callback fires once no matter how many
    paths close the loader (explicit close x2 + end-of-drain)."""
    from cut_detection_tpu.data.loader import PrefetchLoader

    calls = []
    loader = PrefetchLoader(iter([1, 2, 3]), depth=2,
                            on_close=lambda: calls.append(1))
    assert list(loader) == [1, 2, 3]  # drain closes
    loader.close()
    loader.close()
    assert calls == [1]


def test_segment_many_pipelined_matches_sequential(synthetic_video, tmp_path):
    """pipeline_decode (default on) starts video i+1's decode while
    video i runs — the batch-CLI analog of serve's /segment_batch.
    Outputs must be byte-identical to the strictly sequential path."""
    from cut_detection_tpu.pipeline import segment_many

    vids = [synthetic_video] * 3
    outs_p = [str(tmp_path / f"p{i}.csv") for i in range(3)]
    outs_s = [str(tmp_path / f"s{i}.csv") for i in range(3)]
    segment_many(vids, outs_p, batch_size=64, print_every=0)
    segment_many(vids, outs_s, batch_size=64, print_every=0,
                 pipeline_decode=False)
    for a, b in zip(outs_p, outs_s):
        assert open(a, "rb").read() == open(b, "rb").read()

    # device_resize composes (pipelining silently disabled, since the
    # preloaded host-resized frames can't feed the on-device preprocess).
    outs_d = [str(tmp_path / f"d{i}.csv") for i in range(2)]
    segment_many(vids[:2], outs_d, batch_size=64, print_every=0,
                 device_resize=True)
    assert open(outs_d[0], "rb").read() == open(outs_s[0], "rb").read()


def test_classify_step_memoized_per_net():
    """make_classify_step returns the SAME jitted object for the same
    (net, options) — serve warmup and every later request share one
    compile cache in-process — and distinct objects per option set."""
    from cut_detection_tpu.models.assembly import load_default_net
    from cut_detection_tpu.pipeline import make_classify_step

    net, _ = load_default_net()
    s1 = make_classify_step(net)
    s2 = make_classify_step(net)
    assert s1 is s2
    s3 = make_classify_step(net, device_resize=(144, 256))
    assert s3 is not s1
    assert make_classify_step(net, device_resize=(144, 256)) is s3
    net2, _ = load_default_net()
    assert make_classify_step(net2) is not s1


def test_classify_step_cache_frees_dropped_nets():
    """The memo is weakly keyed AND its values must not capture the net:
    a dropped model (e.g. replaced via serve /reload) frees its steps
    instead of leaking weights + executables for the daemon's lifetime."""
    import gc
    import weakref

    from cut_detection_tpu.models.assembly import load_default_net
    from cut_detection_tpu.pipeline import _STEP_CACHE, make_classify_step

    for precision in ("float32", "uint8_chain"):
        net, _ = load_default_net(precision=precision)
        make_classify_step(net)
        make_classify_step(net, device_resize=(144, 256))
        ref = weakref.ref(net)
        assert net in _STEP_CACHE
        del net
        gc.collect()
        assert ref() is None, (
            f"{precision}: net kept alive by its own memoized step")


def test_score_cache_written_atomically(synthetic_video, tmp_path,
                                        monkeypatch):
    """The resume cache is written via tmp+rename: a process killed
    mid-write leaves either no cache or a complete one, never a corrupt
    npz for the resumed run to choke on."""
    import numpy as _np

    cache = str(tmp_path / "scores.npz")
    replaced = []
    real_replace = os.replace

    def spy_replace(src, dst):
        replaced.append((src, dst))
        return real_replace(src, dst)

    monkeypatch.setattr(os, "replace", spy_replace)
    classify_video(synthetic_video, batch_size=32, print_every=0,
                   cache_path=cache)
    assert any(dst == cache and src.endswith(".tmp.npz")
               for src, dst in replaced)
    with _np.load(cache) as data:
        assert data["conf"].shape == data["pred"].shape
    assert not os.path.exists(cache + ".tmp.npz")


def test_parallel_reader_worker_death_truncates_not_hangs(synthetic_video):
    """A decode worker whose decoder RAISES (inexact seek into EOF, a
    corrupt container) publishes the failure instead of dying silently —
    the consumer truncates loudly (the reference's failure contract)
    rather than blocking forever on a chunk no one will produce."""
    from cut_detection_tpu.data import video as V

    class RaisingAfterSeek:
        def __init__(self, inner):
            self.inner = inner

        def seek(self, idx):
            if idx >= 64:
                raise IOError("synthetic seek failure")
            self.inner.seek(idx)

        def read(self):
            return self.inner.read()

        def close(self):
            self.inner.close()

    reader = V.ParallelVideoReader(synthetic_video, resize=256,
                                   num_threads=2, chunk_frames=64)
    orig = reader._new_decoder
    reader._new_decoder = lambda: RaisingAfterSeek(orig())
    frames = list(reader)
    # Chunks 0-1 decode (chunk 1's boundary seek is to frame 63, below
    # the failure threshold); chunk 2's seek to frame 127 raises, the
    # worker publishes ok=False, and the stream truncates at 128.
    assert len(frames) == 128
    assert reader.frames_failed > 0


def test_parallel_reader_all_workers_dead_raises(synthetic_video):
    """If every worker dies before publishing (decoder construction
    failure), iteration raises instead of hanging forever."""
    from cut_detection_tpu.data import video as V

    reader = V.ParallelVideoReader(synthetic_video, resize=256,
                                   num_threads=2, chunk_frames=64)
    reader._new_decoder = lambda: (_ for _ in ()).throw(
        RuntimeError("no decoder"))
    with pytest.raises(RuntimeError, match="all decode workers exited"):
        list(reader)


def test_parallel_reader_no_frame_count_falls_back_sequential(
        synthetic_video):
    """A container reporting no frame count (webm/mkv/streams) decodes
    sequentially to EOF instead of silently yielding zero frames."""
    from cut_detection_tpu.data import video as V

    ref = list(V.VideoFrameSource(synthetic_video, resize=256))
    reader = V.ParallelVideoReader(synthetic_video, resize=256,
                                   num_threads=2, chunk_frames=64)
    reader.length = 0  # emulate absent metadata
    frames = list(reader)
    assert len(frames) == len(ref)
    np.testing.assert_array_equal(frames[0], ref[0])
    np.testing.assert_array_equal(frames[-1], ref[-1])
    assert reader.length == len(ref)  # observed count recorded


def test_open_video_unreadable_raises(tmp_path):
    """cv2 and native backends agree: an unopenable file is an IOError,
    not a silent empty stream."""
    from cut_detection_tpu.data.video import open_video

    with pytest.raises(IOError):
        open_video(str(tmp_path / "nope.mp4"))


def test_prefetch_loader_rejects_nonpositive_depth():
    from cut_detection_tpu.data.loader import PrefetchLoader

    with pytest.raises(ValueError, match="depth"):
        PrefetchLoader(iter([1]), depth=0)


def test_resolve_transfer_auto_rules(monkeypatch):
    """resolve_transfer picks yuv420 exactly when an accelerator backend
    + the native YUV decoder are present and the caller isn't doing
    on-device preprocess / consuming a BGR decode-ahead handle
    (VERDICT r4 #5: the production default, by criteria)."""
    import jax

    from cut_detection_tpu import pipeline as pl
    from cut_detection_tpu.data import native_video as nv

    # Explicit modes pass through untouched.
    assert pl.resolve_transfer("bgr") == "bgr"
    assert pl.resolve_transfer("yuv420") == "yuv420"
    # Forced-CPU test backend: auto -> bgr (no transfer to halve).
    assert pl.resolve_transfer("auto") == "bgr"
    # Accelerator + native YUV -> yuv420; preprocess/preloaded veto it.
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(nv, "yuv_available", lambda: True)
    assert pl.resolve_transfer("auto") == "yuv420"
    assert pl.resolve_transfer("auto", on_device_preprocess=True) == "bgr"
    assert pl.resolve_transfer("auto", has_preloaded=True) == "bgr"
    # Accelerator without the native lib -> bgr.
    monkeypatch.setattr(nv, "yuv_available", lambda: False)
    assert pl.resolve_transfer("auto") == "bgr"


def test_classify_video_transfer_auto_on_cpu(synthetic_video):
    """transfer='auto' (the default) on the CPU backend resolves to bgr
    and produces scores identical to an explicit bgr run."""
    from cut_detection_tpu.pipeline import classify_video

    conf_a, pred_a, _ = classify_video(synthetic_video, batch_size=64,
                                       frame_limit=64, print_every=0,
                                       transfer="auto")
    conf_b, pred_b, _ = classify_video(synthetic_video, batch_size=64,
                                       frame_limit=64, print_every=0,
                                       transfer="bgr")
    import numpy as np

    np.testing.assert_array_equal(conf_a, conf_b)
    np.testing.assert_array_equal(pred_a, pred_b)


def test_bounded_concat_matches_flat_concatenate():
    """_bounded_concat must equal one flat concatenate for every list
    length around the fan-in boundary (1, fan-1, fan, fan+1, multi-level)
    and preserve dtype.  The bound exists because a 3h game's ~2.5k
    per-batch score vectors in ONE jnp.concatenate built a 2,532-operand
    XLA program whose one-off compile stalled the post-loop tail for
    minutes through the relay (round 5, first 324k-frame run)."""
    import jax.numpy as jnp

    from cut_detection_tpu.pipeline import _CONCAT_FAN_IN, _bounded_concat

    fan = _CONCAT_FAN_IN
    rng = np.random.default_rng(0)
    for n in (1, 2, fan - 1, fan, fan + 1, 2 * fan + 3):
        parts = [jnp.asarray(rng.integers(0, 100, 4).astype(np.float32))
                 for _ in range(n)]
        got = np.asarray(_bounded_concat(parts))
        want = np.asarray(jnp.concatenate(parts)) if n > 1 \
            else np.asarray(parts[0])
        np.testing.assert_array_equal(got, want)
    ints = [jnp.asarray(np.array([i], np.int32)) for i in range(fan + 2)]
    out = _bounded_concat(ints)
    assert out.dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(out),
                                  np.arange(fan + 2, dtype=np.int32))
