"""HTTP serving demo contract: examples/serve_http.py over a real socket.

The reference has no serving layer at all (SURVEY.md §2 — evaluation only);
this pins the example server's wire contract: JSON and binary (.npy in /
.npz out) request/response encodings, uint8 normalization, health geometry,
and error paths. The server runs as a subprocess on CPU with the tiny demo
artifact (--demo).
"""

import io
import json
import os
import socket
import subprocess
import sys
import time
import urllib.error
import urllib.request

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def server():
    port = _free_port()
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "examples", "serve_http.py"),
         "--demo", "--cpu", "--port", str(port)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )
    url = f"http://127.0.0.1:{port}"
    try:
        deadline = time.time() + 120
        while True:
            try:
                with urllib.request.urlopen(url + "/health", timeout=5) as r:
                    json.loads(r.read())
                break
            except (urllib.error.URLError, ConnectionError):
                if proc.poll() is not None or time.time() > deadline:
                    # kill BEFORE reading: .read() on a live process's pipe
                    # blocks until EOF, which never comes while it runs
                    proc.kill()
                    proc.wait()
                    out = proc.stdout.read().decode(errors="replace")
                    raise RuntimeError(f"server did not come up:\n{out[-2000:]}")
                time.sleep(1)
        yield url
    finally:
        proc.kill()
        proc.wait()


def _post(url, body, headers):
    req = urllib.request.Request(url + "/predict", data=body, headers=headers)
    with urllib.request.urlopen(req, timeout=300) as r:
        return r.read(), r.headers.get("Content-Type")


def test_health_geometry(server):
    with urllib.request.urlopen(server + "/health", timeout=30) as r:
        h = json.loads(r.read())
    assert h["status"] == "ok"
    assert h["image_size"] == 16 and h["members"] == 3
    assert "batching" in h


def test_json_roundtrip(server):
    imgs = np.random.default_rng(0).random((3, 16, 16, 3)).astype(np.float32)
    body, ct = _post(server, json.dumps({"images": imgs.tolist()}).encode(),
                     {"Content-Type": "application/json"})
    assert ct == "application/json"
    out = json.loads(body)
    assert sorted(out) == ["majority_vote", "mc_variance", "piw", "probs"]
    probs = np.asarray(out["probs"])
    assert probs.shape == (3, 2)
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-4)


def test_npy_request_npz_response(server):
    imgs = np.random.default_rng(1).random((2, 16, 16, 3)).astype(np.float32)
    buf = io.BytesIO()
    np.save(buf, imgs)
    body, ct = _post(server, buf.getvalue(),
                     {"Content-Type": "application/octet-stream",
                      "Accept": "application/octet-stream"})
    assert ct == "application/octet-stream"
    z = np.load(io.BytesIO(body))
    assert sorted(z.files) == ["majority_vote", "mc_variance", "piw", "probs"]
    assert z["probs"].shape == (2, 2)
    assert np.isfinite(z["probs"]).all()


def test_npy_uint8_normalized(server):
    """uint8 payloads are divided by 255 server-side — dtype must not leak
    through to the model as 0..255 floats."""
    imgs = (np.random.default_rng(2).random((2, 16, 16, 3)) * 255).astype(np.uint8)
    buf = io.BytesIO()
    np.save(buf, imgs)
    body, _ = _post(server, buf.getvalue(),
                    {"Content-Type": "application/octet-stream"})
    probs = np.asarray(json.loads(body)["probs"])
    # 0..255 inputs through the demo guidance would saturate the softmax to
    # one-hot rows; normalized inputs keep both classes in play
    assert probs.shape == (2, 2) and np.isfinite(probs).all()
    assert (probs > 1e-4).all()


def test_npy_uint16_normalized(server):
    """Integer payloads normalize by their dtype max — a uint16 medical scan
    must not hit the model as 0..65535 floats."""
    imgs = (np.random.default_rng(3).random((2, 16, 16, 3)) * 65535).astype(np.uint16)
    buf = io.BytesIO()
    np.save(buf, imgs)
    body, _ = _post(server, buf.getvalue(),
                    {"Content-Type": "application/octet-stream"})
    probs = np.asarray(json.loads(body)["probs"])
    assert np.isfinite(probs).all() and (probs > 1e-4).all()


def _npz_bytes():
    buf = io.BytesIO()
    np.savez(buf, images=np.zeros((1, 16, 16, 3), np.float32))
    return buf.getvalue()


def _int16_npy():
    buf = io.BytesIO()
    np.save(buf, np.zeros((1, 16, 16, 3), np.int16))
    return buf.getvalue()


@pytest.mark.parametrize("body,headers", [
    (b"not-an-npy", {"Content-Type": "application/octet-stream"}),
    # an .npz posted back (the server's own response format) must 400, not
    # crash the handler thread with an AttributeError
    (_npz_bytes(), {"Content-Type": "application/octet-stream"}),
    # corrupt zip-magic body: np.load raises BadZipFile, must still be a 400
    (b"PK\x03\x04garbage", {"Content-Type": "application/octet-stream"}),
    # signed ints have no defined normalization -> rejected, not guessed
    (_int16_npy(), {"Content-Type": "application/octet-stream"}),
    (b"{\"wrong\": 1}", {"Content-Type": "application/json"}),
    (b"{not json", {"Content-Type": "application/json"}),
])
def test_bad_payloads_400(server, body, headers):
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, body, headers)
    assert e.value.code == 400


def test_unknown_path_404(server):
    # _post appends /predict, so this posts to /nope/predict — any
    # non-/predict path must 404
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server + "/nope", b"{}", {"Content-Type": "application/json"})
    assert e.value.code == 404
