"""Web demo server routes, incl. the client-side engine surfaces.

Spins examples/web/main.py (native engine) in a subprocess and checks the
routes the in-browser engine depends on: /static/pico.js, /cascade/...
(reference wasm/http/serve.go:17-57 equivalent), the bit-exact grayscale
packet for /selftest, the golden fixture, and /detect. The JS engine itself
is verified in-browser at /selftest (no JS runtime exists in CI — the
reference's WASM layer is likewise browser-verified only).
"""

from __future__ import annotations

import json
import os
import socket
import struct
import subprocess
import sys
import time
import urllib.request

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def server():
    pytest.importorskip("cv2")
    from pigo_tpu.native import native_available

    if not native_available():
        pytest.skip("native engine unavailable")
    port = _free_port()
    env = dict(os.environ, PIGO_TPU_PLATFORM="cpu")
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "examples", "web", "main.py"),
         "--engine", "native", "--port", str(port)],
        cwd=REPO, env=env,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    base = f"http://127.0.0.1:{port}"
    try:
        for _ in range(120):
            if proc.poll() is not None:
                pytest.fail("web server exited early")
            try:
                urllib.request.urlopen(base + "/stats", timeout=2)
                break
            except OSError:
                time.sleep(0.5)
        else:
            pytest.fail("web server did not come up")
        yield base
    finally:
        proc.terminate()
        proc.wait(timeout=10)


def _get(base, path):
    with urllib.request.urlopen(base + path, timeout=30) as resp:
        return resp.status, resp.read()


def test_page_offers_both_engines(server):
    status, body = _get(server, "/?engine=client")
    assert status == 200
    text = body.decode()
    assert "/static/pico.js" in text
    assert "engine=client" in text
    assert "selftest" in text


def test_pico_js_served(server):
    status, body = _get(server, "/static/pico.js")
    assert status == 200
    text = body.decode()
    for sym in ("classifyRegion", "classifyRotatedRegion", "runCascade",
                "clusterDetections", "pupilWalk", "runDetector",
                "getLandmarkPoint", "detectAll", "loadModels"):
        assert f"function {sym}" in text, sym
    # bracket balance over code only (comments use interval notation)
    import re

    code = re.sub(r"/\*.*?\*/", "", text, flags=re.S)
    code = re.sub(r"//[^\n]*", "", code)
    assert code.count("{") == code.count("}")
    assert code.count("(") == code.count(")")
    assert code.count("[") == code.count("]")


def test_cascades_served_byte_exact(server):
    from pigo_tpu.cascade.assets import asset_path

    for rel, parts in [("/cascade/facefinder", ("cascade", "facefinder")),
                       ("/cascade/puploc", ("cascade", "puploc")),
                       ("/cascade/lps/lp42", ("cascade", "lps", "lp42"))]:
        status, body = _get(server, rel)
        assert status == 200
        with open(asset_path(*parts), "rb") as fh:
            assert body == fh.read(), rel


def test_gray_packet_bit_exact(server):
    from pigo_tpu.cascade.assets import asset_path
    from pigo_tpu.io.image import get_image, rgb_to_grayscale

    status, body = _get(server, "/testdata/sample.gray")
    assert status == 200
    rows, cols = struct.unpack_from("<II", body)
    img = get_image(asset_path("testdata", "sample.jpg"))
    assert (rows, cols) == (img.shape[0], img.shape[1])
    assert np.array_equal(np.frombuffer(body, np.uint8, offset=8),
                          rgb_to_grayscale(img))


def test_golden_fixture_served(server):
    status, body = _get(server, "/golden/sample.json")
    assert status == 200
    with open(os.path.join(REPO, "tests", "golden", "sample.json"), "rb") as fh:
        assert body == fh.read()


def test_selftest_page_served(server):
    status, body = _get(server, "/selftest")
    assert status == 200
    assert b"pico.js" in body and b"self-test" in body


def test_detect_roundtrip(server):
    with open(os.path.join(REPO, "assets", "testdata", "sample.jpg"),
              "rb") as fh:
        payload = fh.read()
    req = urllib.request.Request(server + "/detect", data=payload,
                                 method="POST")
    with urllib.request.urlopen(req, timeout=120) as resp:
        results = json.load(resp)
    assert len(results) == 1
    assert results[0]["face"]["size"] > 100
    assert len(results[0]["eyes"]) == 2
    assert len(results[0]["landmark_points"]) == 15
