"""HTTP serving daemon tests (cli/serve.py)."""

import json
import threading
import urllib.parse
import urllib.request

import pytest


@pytest.fixture(scope="module")
def server(synthetic_video):
    from cut_detection_tpu.cli.serve import make_server

    srv, state = make_server("127.0.0.1", 0)  # ephemeral port
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}", state
    srv.shutdown()


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_healthz(server):
    base, _ = server
    with urllib.request.urlopen(base + "/healthz") as resp:
        data = json.loads(resp.read())
    assert data["status"] == "ok"


def test_segment_request(server, synthetic_video, tmp_path):
    base, state = server
    out = str(tmp_path / "served.csv")
    status, data = _post(base + "/segment", {
        "input_path": synthetic_video,
        "output_path": out,
        "batch_size": 64,
    })
    assert status == 200
    assert data["output_path"] == out
    assert data["stats"]["frames"] > 0
    assert all(lab in ("a22", "ez", "b") for _, lab in data["segments"])
    with open(out, "rb") as f:
        assert b"\r\n" in f.read()
    assert state.requests_served >= 1


def test_segment_bad_requests(server):
    base, _ = server
    status, data = _post(base + "/segment", {})
    assert status == 400
    status, data = _post(base + "/segment", {"input_path": "/no/such.mp4"})
    assert status == 400
    assert "does not exist" in data["error"]
    with urllib.request.urlopen(base + "/healthz") as resp:
        assert resp.status == 200  # still alive after errors


def test_unknown_route(server):
    base, _ = server
    status, _ = _post(base + "/nope", {})
    assert status == 404


def test_concurrent_requests_serialize(server, synthetic_video, tmp_path):
    """Two simultaneous /segment requests both succeed (the device lock
    serializes them rather than corrupting shared state)."""
    results = []

    def hit(tag):
        out = str(tmp_path / f"c{tag}.csv")
        status, data = _post(server[0] + "/segment", {
            "input_path": synthetic_video,
            "output_path": out,
            "batch_size": 64,
            "frame_limit": 64,
        })
        results.append((status, data.get("stats", {}).get("frames")))

    ts = [threading.Thread(target=hit, args=(i,)) for i in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=120)
    assert len(results) == 2
    assert all(status == 200 and frames for status, frames in results)


def test_decode_ahead_concurrent_outputs_unchanged(server, synthetic_video,
                                                   tmp_path):
    """Decode-ahead (on by default) overlaps a queued request's host
    decode with the in-flight request's device compute; the CSVs must be
    byte-identical to a serial request's (VERDICT r2 item 6)."""
    assert server[1].decode_ahead is True
    serial = str(tmp_path / "da_serial.csv")
    status, _ = _post(server[0] + "/segment", {
        "input_path": synthetic_video, "output_path": serial,
    })
    assert status == 200
    results = []

    def hit(tag):
        out = str(tmp_path / f"da{tag}.csv")
        status, data = _post(server[0] + "/segment", {
            "input_path": synthetic_video, "output_path": out,
        })
        results.append((status, out))

    ts = [threading.Thread(target=hit, args=(i,)) for i in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=120)
    golden = open(serial, "rb").read()
    assert len(results) == 2
    for status, out in results:
        assert status == 200
        assert open(out, "rb").read() == golden
    # The lock-wait metric is populated for operators to verify the
    # overlap on their hardware.
    with urllib.request.urlopen(server[0] + "/metrics") as resp:
        m = json.loads(resp.read())
    assert "lock_wait_p50_s" in m


def test_serve_custom_model_dir(tmp_path, synthetic_video):
    """The daemon can host a user-trained triplet (not just the prod net)."""
    import jax

    from cut_detection_tpu.cli.serve import make_server
    from cut_detection_tpu.config import TrainConfig
    from cut_detection_tpu.train.checkpointing import save_model_triplet
    from cut_detection_tpu.train.supervised import init_train_state

    cfg = TrainConfig(conv_layers=2, conv_hidden_channels=8, avg_pool_size=2,
                      linear_layers=2, linear_size=8, output_size=3,
                      batch_size=8, epochs=1)
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    save_model_triplet(str(tmp_path), "custom", state, cfg)

    srv, state_obj = make_server("127.0.0.1", 0, model_dir=str(tmp_path),
                                 model_name="custom")
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        out = str(tmp_path / "served.csv")
        status, data = _post(f"http://127.0.0.1:{port}/segment", {
            "input_path": synthetic_video,
            "output_path": out,
            "batch_size": 64,
            "frame_limit": 64,
        })
        assert status == 200
        assert data["stats"]["frames"] > 0
    finally:
        srv.shutdown()


def test_metrics_endpoint(server, synthetic_video, tmp_path):
    """/metrics reports request counters and latency percentiles."""
    base, _ = server
    out = str(tmp_path / "m.csv")
    status, _ = _post(base + "/segment", {
        "input_path": synthetic_video, "output_path": out,
        "batch_size": 64, "frame_limit": 64})
    assert status == 200
    with urllib.request.urlopen(base + "/metrics") as resp:
        m = json.loads(resp.read())
    assert m["requests_served"] >= 1
    assert m["frames_total"] >= 64
    assert m["latency_p50_s"] > 0
    assert m["queue_depth"] == 0
    # Failed requests are counted separately.
    _post(base + "/segment", {"input_path": "/no/such.mp4"})
    with urllib.request.urlopen(base + "/metrics") as resp:
        m2 = json.loads(resp.read())
    assert m2["requests_failed"] >= 1


def test_upload_then_segment(server, synthetic_video, tmp_path):
    """/upload spools raw bytes; the returned path feeds /segment —
    remote ingestion without a shared volume."""
    base, state = server
    raw = open(synthetic_video, "rb").read()
    name = urllib.parse.quote("../evil dir/ga me.mp4")
    req = urllib.request.Request(
        base + "/upload?name=" + name, data=raw,
        headers={"Content-Type": "application/octet-stream"},
        method="POST")
    with urllib.request.urlopen(req) as resp:
        up = json.loads(resp.read())
    assert up["bytes"] == len(raw)
    # Sanitized into the spool dir: no traversal, safe charset.
    assert up["input_path"].startswith(state.spool_dir)
    assert "/evil" not in up["input_path"] and " " not in up["input_path"]

    out = str(tmp_path / "uploaded.csv")
    status, data = _post(base + "/segment", {
        "input_path": up["input_path"], "output_path": out,
        "batch_size": 64, "frame_limit": 64})
    assert status == 200
    assert data["stats"]["frames"] > 0


def test_upload_size_cap(server):
    base, state = server
    old = state.max_upload_bytes
    state.max_upload_bytes = 10
    try:
        req = urllib.request.Request(base + "/upload", data=b"x" * 100,
                                     method="POST")
        try:
            urllib.request.urlopen(req)
            status = 200
        except urllib.error.HTTPError as e:
            status = e.code
        assert status == 413
    finally:
        state.max_upload_bytes = old


def test_segment_batch(server, synthetic_video, tmp_path):
    """/segment_batch processes a list, isolating per-video failures."""
    base, _ = server
    status, data = _post(base + "/segment_batch", {
        "input_paths": [synthetic_video, "/no/such.mp4"],
        "batch_size": 64, "frame_limit": 64})
    assert status == 200
    ok, bad = data["results"]
    assert ok["stats"]["frames"] > 0
    assert "error" in bad
    status, data = _post(base + "/segment_batch", {"input_paths": []})
    assert status == 400
    # A shared output_path would make every video overwrite one CSV.
    status, data = _post(base + "/segment_batch", {
        "input_paths": [synthetic_video], "output_path": "/tmp/x.csv"})
    assert status == 400
    assert "output_path" in data["error"]


def test_segment_batch_pipelines_decode_ahead(server, synthetic_video,
                                              tmp_path):
    """With decode-ahead on (default), the batch endpoint starts video
    i+1's host decode while video i runs; results must be identical to
    the unpipelined path (and to each other for identical inputs)."""
    import shutil

    base, state = server
    assert state.decode_ahead is True
    copy = str(tmp_path / "copy.mp4")
    shutil.copy(synthetic_video, copy)
    status, data = _post(base + "/segment_batch", {
        "input_paths": [synthetic_video, copy, synthetic_video],
        "batch_size": 64})
    assert status == 200
    r = data["results"]
    assert len(r) == 3 and all("segments" in x for x in r)
    assert r[0]["segments"] == r[1]["segments"] == r[2]["segments"]
    # Identical to a plain single /segment of the same video.
    status, one = _post(base + "/segment", {
        "input_path": synthetic_video, "batch_size": 64,
        "output_path": str(tmp_path / "one.csv")})
    assert status == 200
    assert one["segments"] == r[0]["segments"]
    # A bad model name with pipelined decode-ahead must not wedge the
    # producer (ownership is closed on the validation error path).
    status, data = _post(base + "/segment_batch", {
        "input_paths": [synthetic_video], "model": "nope"})
    assert status == 200
    assert "error" in data["results"][0]


def test_reload_accepts_every_precision_choice(server):
    """/reload validates precision against config.PRECISION_CHOICES —
    a server started with --precision uint8_chain must be able to
    hot-swap (the round-3 rung was missing from a hardcoded list)."""
    base, _ = server
    status, data = _post(base + "/reload", {"precision": "uint8_chain"})
    assert status == 200, data
    status, data = _post(base + "/reload", {"precision": "float32"})
    assert status == 200, data
    status, data = _post(base + "/reload", {"precision": "nope"})
    assert status == 400


def test_spool_ttl_sweep(server, tmp_path):
    """Expired spool files are deleted on the next upload."""
    import os
    import time as _time

    base, state = server
    old_ttl = state.spool_ttl_s
    state.spool_ttl_s = 0.05
    try:
        req = urllib.request.Request(base + "/upload?name=a.bin",
                                     data=b"abc", method="POST")
        with urllib.request.urlopen(req) as resp:
            first = json.loads(resp.read())["input_path"]
        assert os.path.exists(first)
        _time.sleep(0.2)
        req = urllib.request.Request(base + "/upload?name=b.bin",
                                     data=b"def", method="POST")
        with urllib.request.urlopen(req) as resp:
            second = json.loads(resp.read())["input_path"]
        assert not os.path.exists(first)   # swept as expired
        assert os.path.exists(second)
    finally:
        state.spool_ttl_s = old_ttl


def test_reload_model(server, synthetic_video, tmp_path):
    """/reload hot-swaps to a user triplet and back to the default; bad
    dirs are rejected without disturbing the serving model."""
    import jax

    from cut_detection_tpu.config import TrainConfig
    from cut_detection_tpu.train.checkpointing import save_model_triplet
    from cut_detection_tpu.train.supervised import init_train_state

    base, state = server
    cfg = TrainConfig(conv_layers=2, conv_hidden_channels=8, avg_pool_size=2,
                      linear_layers=2, linear_size=8, output_size=3,
                      batch_size=8, epochs=1)
    tstate = init_train_state(jax.random.PRNGKey(1), cfg)
    save_model_triplet(str(tmp_path), "swap", tstate, cfg)

    status, data = _post(base + "/reload", {
        "model_dir": str(tmp_path), "model_name": "swap"})
    assert status == 200 and data["status"] == "reloaded"
    small_params = data["params"]

    # Serving works on the swapped model.
    out = str(tmp_path / "swapped.csv")
    status, data = _post(base + "/segment", {
        "input_path": synthetic_video, "output_path": out,
        "batch_size": 64, "frame_limit": 64})
    assert status == 200

    # A bad reload leaves the current model serving.
    status, data = _post(base + "/reload", {
        "model_dir": "/no/such/dir", "model_name": "x"})
    assert status == 400
    assert state.net.num_params() == small_params

    # Back to the bundled prod net for the rest of the module's tests.
    status, data = _post(base + "/reload", {})
    assert status == 200
    assert data["params"] == 67971


@pytest.fixture(scope="module")
def tls_certs(tmp_path_factory):
    """Self-signed server cert + a client CA with one signed client cert."""
    import subprocess

    d = tmp_path_factory.mktemp("tls")

    def ossl(*args):
        subprocess.run(["openssl", *args], check=True, cwd=d,
                       capture_output=True)

    # Server cert (self-signed, CN=localhost, SAN for 127.0.0.1).
    ossl("req", "-x509", "-newkey", "rsa:2048", "-nodes", "-days", "2",
         "-keyout", "server.key", "-out", "server.crt",
         "-subj", "/CN=127.0.0.1",
         "-addext", "subjectAltName=IP:127.0.0.1")
    # Client CA + a client cert signed by it.
    ossl("req", "-x509", "-newkey", "rsa:2048", "-nodes", "-days", "2",
         "-keyout", "ca.key", "-out", "ca.crt", "-subj", "/CN=testca")
    ossl("req", "-newkey", "rsa:2048", "-nodes", "-keyout", "client.key",
         "-out", "client.csr", "-subj", "/CN=client")
    ossl("x509", "-req", "-in", "client.csr", "-CA", "ca.crt",
         "-CAkey", "ca.key", "-CAcreateserial", "-days", "2",
         "-out", "client.crt")
    return d


def test_tls_and_mtls(tls_certs):
    """HTTPS serving works; with --client-ca, certless clients are
    rejected and cert-holding clients succeed (mTLS)."""
    import ssl

    from cut_detection_tpu.cli.serve import make_server

    d = tls_certs
    srv, _ = make_server("127.0.0.1", 0,
                         certfile=str(d / "server.crt"),
                         keyfile=str(d / "server.key"),
                         client_ca=str(d / "ca.crt"))
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"https://127.0.0.1:{port}"
        trust_server = ssl.create_default_context(cafile=str(d / "server.crt"))

        # No client cert -> TLS handshake rejected.
        with pytest.raises(Exception):
            urllib.request.urlopen(base + "/healthz", context=trust_server,
                                   timeout=10)

        # With the CA-signed client cert -> served.
        ctx = ssl.create_default_context(cafile=str(d / "server.crt"))
        ctx.load_cert_chain(str(d / "client.crt"), str(d / "client.key"))
        with urllib.request.urlopen(base + "/healthz", context=ctx,
                                    timeout=10) as resp:
            assert json.loads(resp.read())["status"] == "ok"
    finally:
        srv.shutdown()


def test_multi_model_routing(server, synthetic_video, tmp_path):
    """Requests route to preloaded models by name; /reload can swap a
    named slot; unknown names are a 400."""
    import jax

    from cut_detection_tpu.cli.serve import _parse_model_flags
    from cut_detection_tpu.config import TrainConfig
    from cut_detection_tpu.train.checkpointing import save_model_triplet
    from cut_detection_tpu.train.supervised import init_train_state

    assert _parse_model_flags(["a=/d", "b=/e:custom"]) == {
        "a": ("/d", "init_model"), "b": ("/e", "custom")}

    base, state = server
    cfg = TrainConfig(conv_layers=2, conv_hidden_channels=8, avg_pool_size=2,
                      linear_layers=2, linear_size=8, output_size=3,
                      batch_size=8, epochs=1)
    save_model_triplet(str(tmp_path), "alt",
                       init_train_state(jax.random.PRNGKey(2), cfg), cfg)

    # Register under a named slot via /reload.
    status, data = _post(base + "/reload", {
        "model": "alt", "model_dir": str(tmp_path), "model_name": "alt"})
    assert status == 200 and data["model"] == "alt"
    with urllib.request.urlopen(base + "/healthz") as resp:
        assert json.loads(resp.read())["models"] == ["default", "alt"]

    out = str(tmp_path / "alt.csv")
    status, data = _post(base + "/segment", {
        "input_path": synthetic_video, "output_path": out,
        "model": "alt", "batch_size": 64, "frame_limit": 64})
    assert status == 200 and data["stats"]["frames"] > 0

    status, data = _post(base + "/segment", {
        "input_path": synthetic_video, "model": "nope"})
    assert status == 400 and "unknown model" in data["error"]

    # The default model is untouched.
    assert state.net.num_params() == 67971


def test_auth_token_gate(server):
    """With auth_token set, everything but /healthz returns 401 without
    the bearer header and works with it."""
    base, state = server
    state.auth_token = "sekrit"
    try:
        with urllib.request.urlopen(base + "/healthz") as resp:
            assert resp.status == 200  # liveness stays open

        def get(path, token=None):
            req = urllib.request.Request(base + path)
            if token:
                req.add_header("Authorization", "Bearer " + token)
            try:
                with urllib.request.urlopen(req) as resp:
                    return resp.status
            except urllib.error.HTTPError as e:
                return e.code

        assert get("/metrics") == 401
        assert get("/metrics", "wrong") == 401
        assert get("/metrics", "sekrit") == 200
        status, _ = _post(base + "/segment", {"input_path": "/x.mp4"})
        assert status == 401
    finally:
        state.auth_token = None


def test_reload_rejects_bad_precision_and_mismatched_triplet(
        server, tmp_path):
    """/reload validates the precision string and actually runs a
    forward pass, so an internally-inconsistent triplet (conv and
    linear files from different runs) is caught before the swap."""
    import os
    import shutil

    import jax

    from cut_detection_tpu.config import TrainConfig
    from cut_detection_tpu.train.checkpointing import save_model_triplet
    from cut_detection_tpu.train.supervised import init_train_state

    base, state = server
    before = state.net.num_params()

    try:
        status, data = _post(base + "/reload", {"precision": "fp32"})
        assert status == 400 and "precision" in data["error"]

        # Mix a conv net from one config with a linear head from
        # another: loads fine file-by-file, fails on the first forward
        # (flattened feature size != FC input).
        small = TrainConfig(conv_layers=2, conv_hidden_channels=8,
                            avg_pool_size=2, linear_layers=2,
                            linear_size=8, output_size=3, batch_size=8,
                            epochs=1)
        big = TrainConfig(conv_layers=2, conv_hidden_channels=16,
                          avg_pool_size=2, linear_layers=2,
                          linear_size=8, output_size=3, batch_size=8,
                          epochs=1)
        save_model_triplet(str(tmp_path), "broken",
                           init_train_state(jax.random.PRNGKey(0), small),
                           small)
        save_model_triplet(str(tmp_path), "donor",
                           init_train_state(jax.random.PRNGKey(1), big),
                           big)
        shutil.copy(os.path.join(tmp_path, "donor_classifier_linear.npz"),
                    os.path.join(tmp_path, "broken_classifier_linear.npz"))

        status, data = _post(base + "/reload", {
            "model_dir": str(tmp_path), "model_name": "broken"})
        assert status == 400
        assert state.net.num_params() == before  # old model still serving
    finally:
        _post(base + "/reload", {})  # restore the prod default regardless


def test_auth_token_non_ascii(server):
    """Non-ASCII tokens and header bytes get a clean 401, not a dead
    handler thread."""
    base, state = server
    state.auth_token = "sécret"
    try:
        req = urllib.request.Request(base + "/metrics")
        req.add_header("Authorization", "Bearer wrong")
        try:
            urllib.request.urlopen(req)
            code = 200
        except urllib.error.HTTPError as e:
            code = e.code
        assert code == 401
        req = urllib.request.Request(base + "/metrics")
        req.add_header("Authorization", "Bearer sécret")
        with urllib.request.urlopen(req) as resp:
            assert resp.status == 200
    finally:
        state.auth_token = None


def test_model_flag_reserved_and_duplicate():
    from cut_detection_tpu.cli.serve import _parse_model_flags

    with pytest.raises(ValueError, match="reserved"):
        _parse_model_flags(["default=/d"])
    with pytest.raises(ValueError, match="twice"):
        _parse_model_flags(["a=/d", "a=/e"])


def test_client_ca_requires_certfile():
    from cut_detection_tpu.cli.serve import make_server

    with pytest.raises(ValueError, match="client-ca requires"):
        make_server("127.0.0.1", 0, client_ca="/tmp/nope.crt")


def test_segment_threshold_passthrough(server, synthetic_video, tmp_path):
    """base/blank thresholds in the request body reach the glue pass:
    the served segments equal a direct segment_video_file call with the
    same non-default thresholds."""
    from cut_detection_tpu.pipeline import segment_video_file

    out_direct = str(tmp_path / "direct.csv")
    _, seg, _ = segment_video_file(synthetic_video, out_direct,
                                   base_threshold=8, blank_threshold=4,
                                   print_every=0)

    out_served = str(tmp_path / "served_thresh.csv")
    status, data = _post(server[0] + "/segment", {
        "input_path": synthetic_video,
        "output_path": out_served,
        "base_threshold": 8,
        "blank_threshold": 4,
    })
    assert status == 200
    assert [sf for sf, _ in data["segments"]] == [
        int(s) for s in seg.te["start_frames"]]
    with open(out_direct, "rb") as a, open(out_served, "rb") as b:
        assert a.read() == b.read()


def test_prefetch_slot_accounting(synthetic_video):
    """Decode-ahead is bounded by slots, not queue position: claims up
    to ``prefetch_slots`` pipelines, refuses beyond, and a slot frees
    exactly once when the handle's loader closes (so a waiter can claim
    it immediately)."""
    from cut_detection_tpu.cli.serve import _State, _try_prefetch

    state = _State()
    state.prefetch_slots = 1

    h1 = _try_prefetch(state, synthetic_video, 32, 1)
    assert h1 is not None
    assert state.active_prefetch == 1
    # Slots full: second claim refused regardless of queue depth.
    assert _try_prefetch(state, synthetic_video, 32, 1) is None

    h1[1].close()
    assert state.active_prefetch == 0
    h1[1].close()  # idempotent: the slot is released exactly once
    assert state.active_prefetch == 0

    # Freed slot is claimable again.
    h2 = _try_prefetch(state, synthetic_video, 32, 1)
    assert h2 is not None and state.active_prefetch == 1
    h2[1].close()
    assert state.active_prefetch == 0

    # Gates: disabled decode-ahead and missing files never claim a slot.
    state.decode_ahead = False
    assert _try_prefetch(state, synthetic_video, 32, 1) is None
    state.decode_ahead = True
    assert _try_prefetch(state, "/nonexistent.mp4", 32, 1) is None
    assert state.active_prefetch == 0


def test_prefetch_slot_released_on_drain(synthetic_video, tmp_path):
    """Draining the preloaded batches through classify_video releases
    the slot (the loader closes itself at end of iteration), so the slot
    frees when frames are consumed — not when the request finishes."""
    from cut_detection_tpu.cli.serve import _State, _try_prefetch
    from cut_detection_tpu.pipeline import classify_video

    state = _State()
    h = _try_prefetch(state, synthetic_video, 32, 1)
    assert h is not None and state.active_prefetch == 1
    classify_video(synthetic_video, batch_size=32, print_every=0,
                   preloaded=h)
    assert state.active_prefetch == 0


def test_decode_ahead_starts_while_device_busy(server, synthetic_video,
                                               tmp_path):
    """The overlap itself, asserted structurally (not by timing): while
    the device lock is held by an in-flight request, a queued request's
    host decode claims a prefetch slot and starts producing — so the
    chip-idle-during-decode serialization is provably gone."""
    import time

    base, state = server
    out = str(tmp_path / "overlap.csv")
    results = []

    def hit():
        results.append(_post(base + "/segment", {
            "input_path": synthetic_video, "output_path": out,
        }))

    state.lock.acquire()  # simulate an in-flight request holding the chip
    try:
        t = threading.Thread(target=hit)
        t.start()
        deadline = time.time() + 30
        while state.active_prefetch == 0 and time.time() < deadline:
            time.sleep(0.05)
        # Decode is running while the device is "busy".
        assert state.active_prefetch > 0
    finally:
        state.lock.release()
    t.join(timeout=120)
    assert results and results[0][0] == 200
    # The slot was released when the decoded frames were consumed.
    assert state.active_prefetch == 0


def test_warmup_server_and_reload(synthetic_video, tmp_path):
    """make_server(warmup=True) pre-compiles the serving-shape step for
    every loaded model and still serves correctly; /reload honors the
    warmup flag both ways."""
    from cut_detection_tpu.cli.serve import make_server

    srv, state = make_server("127.0.0.1", 0, warmup=True)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        out = str(tmp_path / "warm.csv")
        status, data = _post(base + "/segment", {
            "input_path": synthetic_video, "output_path": out})
        assert status == 200 and data["stats"]["frames"] > 0

        # Reload with warmup skipped, then with the default (warms).
        status, data = _post(base + "/reload", {"warmup": False})
        assert status == 200 and data["status"] == "reloaded"
        status, data = _post(base + "/reload", {})
        assert status == 200 and data["status"] == "reloaded"
        status, _ = _post(base + "/segment", {
            "input_path": synthetic_video, "output_path": out})
        assert status == 200
    finally:
        srv.shutdown()


def test_serve_parser_warmup_flag():
    from cut_detection_tpu.cli.serve import build_parser

    assert build_parser().parse_args([]).no_warmup is False
    assert build_parser().parse_args(["--no-warmup"]).no_warmup is True


def test_reload_warmup_follows_server_policy(monkeypatch):
    """/reload defaults to the server's warmup policy (--no-warmup means
    reloads don't warm either) and the request flag overrides it."""
    import cut_detection_tpu.cli.serve as serve_mod

    calls = []
    monkeypatch.setattr(serve_mod, "_warmup_net",
                        lambda net, **kw: calls.append(1) or 0.0)
    srv, state = serve_mod.make_server("127.0.0.1", 0, warmup=False)
    assert state.warmup_default is False and calls == []
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        status, _ = _post(base + "/reload", {})
        assert status == 200 and calls == []  # policy: no warmup
        status, _ = _post(base + "/reload", {"warmup": True})
        # Explicit override warms every available transfer mode (ADVICE
        # r4: per-request overrides must not pay a cold compile).
        assert status == 200
        assert calls == [1] * len(serve_mod._warmup_modes(state))
    finally:
        srv.shutdown()


def test_serve_main_init_timeout_exits_3(monkeypatch, tmp_path):
    """A hung backend init makes the daemon exit 3 with a clear log
    instead of hanging forever (supervisors can retry)."""
    import cut_detection_tpu.cli.serve as serve_mod

    import sys
    import time
    import types

    monkeypatch.setenv("CUTDET_INIT_TIMEOUT", "0.2")

    hang = types.ModuleType("jax")
    hang.config = types.SimpleNamespace(update=lambda *a, **k: None)
    hang.devices = lambda: time.sleep(5)
    monkeypatch.setitem(sys.modules, "jax", hang)
    with pytest.raises(SystemExit) as ei:
        serve_mod.main(["--port", "0"])
    assert ei.value.code == 3


def test_device_heartbeat_healthz(synthetic_video, tmp_path):
    """With the heartbeat on, /healthz carries the device-liveness block
    and turns 503/"stuck" when the last success goes stale (the hung-
    tunnel failure mode a process-alive check can't see)."""
    import time

    from cut_detection_tpu.cli.serve import make_server

    srv, state = make_server("127.0.0.1", 0, heartbeat_interval=0.1)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        deadline = time.time() + 10
        data = None
        while time.time() < deadline:
            with urllib.request.urlopen(base + "/healthz") as resp:
                data = json.loads(resp.read())
            if data["device"] and data["device"]["ok_age_s"] < 5:
                break
            time.sleep(0.2)
        assert data["status"] == "ok"
        assert data["device"]["stuck"] is False
        assert data["device"]["last_error"] is None

        # Simulate a wedge: freeze probes and age the last success past
        # the staleness bound.
        state.heartbeat.stop()
        with state.heartbeat._meta:
            state.heartbeat._last_ok = (
                time.monotonic() - state.heartbeat.stale_after - 1)
        try:
            with urllib.request.urlopen(base + "/healthz") as resp:
                status, data = resp.status, json.loads(resp.read())
        except urllib.error.HTTPError as e:
            status, data = e.code, json.loads(e.read())
        assert status == 503
        assert data["status"] == "stuck"
        assert data["device"]["stuck"] is True

        # A completed request proves the device end-to-end and resets
        # the clock even with probes frozen.
        state.record(0.0, 0.1, 10)
        with urllib.request.urlopen(base + "/healthz") as resp:
            assert json.loads(resp.read())["status"] == "ok"
    finally:
        srv.shutdown()


def test_device_heartbeat_outstanding_probe_cap():
    """Hung probes must not pile up unbounded: launches stop at the cap
    and whatever finally completes resets the clock."""
    from cut_detection_tpu.cli.serve import _DeviceHeartbeat

    hb = _DeviceHeartbeat(interval=3600)  # never auto-fires in-test

    # Fill the outstanding budget by hand.
    with hb._meta:
        hb._outstanding = hb._MAX_OUTSTANDING
    # run()'s launch path skips when at the cap — emulate one tick.
    with hb._meta:
        at_cap = hb._outstanding >= hb._MAX_OUTSTANDING
    assert at_cap

    # A probe completing (tunnel healed) decrements and marks ok.
    hb._probe()
    assert hb.status()["stuck"] is False
    assert hb.status()["outstanding_probes"] == hb._MAX_OUTSTANDING - 1


def test_serve_data_parallel_mesh(synthetic_video, tmp_path):
    """make_server(mesh=...) shards each request's frame batches over
    the virtual 8-device mesh; the CSV matches the single-device serve
    byte for byte (the daemon-side analog of segment_videos
    --data-parallel)."""
    from cut_detection_tpu.cli.serve import make_server
    from cut_detection_tpu.parallel.mesh import make_mesh

    srv, state = make_server("127.0.0.1", 0, mesh=make_mesh())
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        out = str(tmp_path / "dp.csv")
        status, data = _post(base + "/segment", {
            "input_path": synthetic_video,
            "output_path": out,
            "batch_size": 64,  # divisible by the 8-way data axis
        })
        assert status == 200 and data["stats"]["frames"] > 0

        # Indivisible batch sizes are a client error, not a daemon crash.
        status, data = _post(base + "/segment", {
            "input_path": synthetic_video, "batch_size": 63,
        })
        assert status == 400
        assert "divisible" in data["error"] or "shard" in data["error"]
    finally:
        srv.shutdown()

    srv2, _ = make_server("127.0.0.1", 0)
    port2 = srv2.server_address[1]
    t2 = threading.Thread(target=srv2.serve_forever, daemon=True)
    t2.start()
    try:
        out2 = str(tmp_path / "sd.csv")
        status, _ = _post(f"http://127.0.0.1:{port2}/segment", {
            "input_path": synthetic_video,
            "output_path": out2,
            "batch_size": 64,
        })
        assert status == 200
    finally:
        srv2.shutdown()
    with open(tmp_path / "dp.csv", "rb") as a, \
            open(tmp_path / "sd.csv", "rb") as b:
        assert a.read() == b.read()


def test_heartbeat_relaunches_after_stale_window():
    """Probes stuck at the outstanding cap must not block recovery
    forever: after one stale_after window a fresh probe launches anyway
    (bounded thread leakage, guaranteed heal detection)."""
    import time

    from cut_detection_tpu.cli.serve import _DeviceHeartbeat

    hb = _DeviceHeartbeat(interval=60)
    with hb._meta:
        hb._outstanding = hb._MAX_OUTSTANDING
        hb._last_launch = time.monotonic() - hb.stale_after - 1
    # Emulate one run() tick's launch decision.
    now = time.monotonic()
    with hb._meta:
        blocked = (hb._outstanding >= hb._MAX_OUTSTANDING
                   and now - hb._last_launch < hb.stale_after)
    assert not blocked  # stale window elapsed: a fresh probe may launch

    with hb._meta:
        hb._last_launch = time.monotonic()
    now = time.monotonic()
    with hb._meta:
        blocked = (hb._outstanding >= hb._MAX_OUTSTANDING
                   and now - hb._last_launch < hb.stale_after)
    assert blocked  # within the window: capped


def test_healthz_redacts_error_detail_when_authed(synthetic_video):
    """With an auth token configured, unauthenticated /healthz must not
    leak raw exception text; the full detail moves to gated /metrics."""
    import time

    from cut_detection_tpu.cli.serve import make_server

    srv, state = make_server("127.0.0.1", 0, auth_token="sekrit",
                             heartbeat_interval=3600)
    with state.heartbeat._meta:
        state.heartbeat._last_err = "RuntimeError: internal /host/path"
        state.heartbeat._last_ok = time.monotonic()
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        with urllib.request.urlopen(base + "/healthz") as resp:
            h = json.loads(resp.read())
        assert h["device"] is not None
        assert "last_error" not in h["device"]

        req = urllib.request.Request(
            base + "/metrics",
            headers={"Authorization": "Bearer sekrit"})
        with urllib.request.urlopen(req) as resp:
            m = json.loads(resp.read())
        assert m["device"]["last_error"] == "RuntimeError: internal /host/path"
    finally:
        srv.shutdown()


def test_segment_request_transfer_yuv420(server, synthetic_video, tmp_path):
    """Per-request {"transfer": "yuv420"} runs the 1.5 B/px upload path
    (accuracy-gated fast mode — CSV-vs-BGR equality is deliberately not
    asserted on synthetic fixtures, see test_yuv.py): the request must
    succeed, be deterministic, and skip the BGR decode-ahead path."""
    from cut_detection_tpu.data import native_video as nv

    if not nv.yuv_available():
        pytest.skip("native YUV decoder unavailable")
    base, state = server
    outs = []
    for tag in ("a", "b"):
        out = str(tmp_path / f"yuv_{tag}.csv")
        status, data = _post(base + "/segment", {
            "input_path": synthetic_video, "output_path": out,
            "batch_size": 64, "transfer": "yuv420",
        })
        assert status == 200
        assert data["stats"]["frames"] == 240
        assert all(lab in ("a22", "ez", "b") for _, lab in data["segments"])
        outs.append(open(out, "rb").read())
    assert outs[0] == outs[1]
    # No BGR decode-ahead pipeline may be left claiming a slot.
    assert state.active_prefetch == 0


def test_segment_request_bad_transfer_is_400(server, synthetic_video):
    base, _ = server
    status, data = _post(base + "/segment", {
        "input_path": synthetic_video, "transfer": "rgb565",
    })
    assert status == 400
    assert "transfer" in data["error"]


def test_serve_transfer_default_applies(synthetic_video, tmp_path):
    """A server started with transfer='yuv420' uses it for requests that
    don't specify one, and per-request 'bgr' still overrides."""
    from cut_detection_tpu.cli.serve import make_server
    from cut_detection_tpu.data import native_video as nv

    if not nv.yuv_available():
        pytest.skip("native YUV decoder unavailable")
    srv, state = make_server("127.0.0.1", 0, transfer="yuv420")
    assert state.transfer == "yuv420"
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        out = str(tmp_path / "default_yuv.csv")
        status, data = _post(base + "/segment", {
            "input_path": synthetic_video, "output_path": out,
            "batch_size": 64,
        })
        assert status == 200
        assert data["stats"]["frames"] == 240
        out2 = str(tmp_path / "override_bgr.csv")
        status, data = _post(base + "/segment", {
            "input_path": synthetic_video, "output_path": out2,
            "batch_size": 64, "transfer": "bgr",
        })
        assert status == 200
    finally:
        srv.shutdown()


def test_serve_parser_transfer_flag():
    from cut_detection_tpu.cli.serve import build_parser

    ns = build_parser().parse_args(["--transfer", "yuv420"])
    assert ns.transfer == "yuv420"
    # Production default is auto (VERDICT r4 #5); on the CPU test
    # backend it resolves to bgr (byte-parity path).
    assert build_parser().parse_args([]).transfer == "auto"
    from cut_detection_tpu.pipeline import resolve_transfer

    assert resolve_transfer("auto") == "bgr"  # forced-CPU test backend


def test_segment_capability_missing_is_501(server, synthetic_video,
                                           monkeypatch):
    """yuv420 on a server whose native decoder lacks YUV entry points is
    a CAPABILITY gap -> 501, not a 400 client error (ADVICE r4)."""
    import cut_detection_tpu.data.native_video as nv

    base, _ = server
    monkeypatch.setattr(nv, "yuv_available", lambda: False)
    status, data = _post(base + "/segment", {
        "input_path": synthetic_video, "transfer": "yuv420",
    })
    assert status == 501
    assert "unavailable on this server" in data["error"]


def test_segment_request_transfer_auto_resolves(server, synthetic_video,
                                                tmp_path):
    """Per-request {"transfer": "auto"} resolves (to bgr on the CPU test
    backend) and serves normally."""
    base, _ = server
    out = str(tmp_path / "auto.csv")
    status, data = _post(base + "/segment", {
        "input_path": synthetic_video, "output_path": out,
        "batch_size": 64, "transfer": "auto",
    })
    assert status == 200
    assert data["stats"]["frames"] > 0


def test_make_server_transfer_auto_resolves_concrete():
    """make_server resolves transfer='auto' to a concrete server default
    at startup (bgr on the CPU test backend)."""
    from cut_detection_tpu.cli.serve import make_server

    srv, state = make_server("127.0.0.1", 0, transfer="auto")
    try:
        assert state.transfer == "bgr"
    finally:
        srv.server_close()


def test_warmup_modes_cover_both_transfers():
    """With the native YUV decoder present, warmup covers both byte
    formats so per-request overrides never pay a cold compile in-request
    (ADVICE r4)."""
    from cut_detection_tpu.cli import serve as serve_mod
    from cut_detection_tpu.data import native_video as nv

    class S:
        transfer = "bgr"

    modes = serve_mod._warmup_modes(S())
    if nv.yuv_available():
        assert modes == ["bgr", "yuv420"]
    else:
        assert modes == ["bgr"]
    S.transfer = "yuv420"
    if nv.yuv_available():
        assert serve_mod._warmup_modes(S()) == ["yuv420", "bgr"]
