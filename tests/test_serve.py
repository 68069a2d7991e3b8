"""HTTP serving daemon tests (cli/serve.py)."""

import json
import threading
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
