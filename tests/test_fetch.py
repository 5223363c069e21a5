"""Offline tests for the dataset downloader (`cli/fetch.py`).

Parity target: `get_models_and_data.py:8-28` — download a zip, extract
it into the destination subdirectory, remove the archive.  The network
is replaced by a loopback HTTP server serving a tiny PCPNet-shaped zip,
so the full download -> unzip -> layout contract runs hermetically.
"""

import http.server
import io
import os
import threading
import zipfile

import numpy as np
import pytest

from nestinet_tpu.cli import fetch
from nestinet_tpu.data.pcpnet import load_shape


def _tiny_pcpnet_zip() -> bytes:
    """A minimal pcpnet/ layout: one shape + a shape list."""
    rng = np.random.RandomState(0)
    pts = rng.uniform(-1, 1, size=(50, 3))
    nrm = rng.randn(50, 3)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)

    def txt(a):
        buf = io.StringIO()
        np.savetxt(buf, a)
        return buf.getvalue()

    blob = io.BytesIO()
    with zipfile.ZipFile(blob, "w") as z:
        z.writestr("pcpnet/mini.xyz", txt(pts))
        z.writestr("pcpnet/mini.normals", txt(nrm))
        z.writestr("pcpnet/testset.txt", "mini\n")
    return blob.getvalue()


@pytest.fixture
def loopback_server():
    payload = {"pcpnet.zip": _tiny_pcpnet_zip()}

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            name = os.path.basename(self.path)
            body = payload.get(name)
            if body is None:
                self.send_error(404)
                return
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # keep pytest output clean
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_address[1]}"
    finally:
        srv.shutdown()
        t.join(timeout=5)


def test_fetch_download_unzip_layout(tmp_path, loopback_server, monkeypatch):
    monkeypatch.setattr(fetch, "BASE_URL", loopback_server)
    root = str(tmp_path / "repo")
    fetch.main(["pcpnet_data", "--root", root])

    # layout contract: data/pcpnet/<shape>.{xyz,normals} + testset.txt,
    # archive removed after extraction (get_models_and_data.py:24-27)
    data_dir = os.path.join(root, "data", "pcpnet")
    assert os.path.exists(os.path.join(data_dir, "testset.txt"))
    assert not os.path.exists(os.path.join(root, "data", "pcpnet.zip"))

    # the extracted tree is exactly what data/pcpnet.py expects
    shape = load_shape(data_dir, "mini", with_normals=True)
    assert shape.pts.shape == (50, 3)
    assert shape.normals.shape == (50, 3)


def test_fetch_unknown_target_rejected(tmp_path):
    with pytest.raises(SystemExit):
        fetch.main(["no_such_resource", "--root", str(tmp_path)])


def test_fetch_unreachable_fails_gracefully(tmp_path, monkeypatch, capsys):
    # a closed loopback port: URLError -> graceful message + exit code 1
    monkeypatch.setattr(fetch, "BASE_URL", "http://127.0.0.1:9")
    with pytest.raises(SystemExit) as e:
        fetch.main(["pcpnet_data", "--root", str(tmp_path)])
    assert e.value.code == 1
    assert "FAILED" in capsys.readouterr().out
