"""Live HTTP preview server (the reference's interactive window analog)."""

import json
import urllib.request

import numpy as np

from brickmap_tpu.utils.preview import PreviewServer


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}",
                                timeout=5) as r:
        return r.read()


def test_preview_server_serves_frames_and_stats():
    srv = PreviewServer(0, host="127.0.0.1")
    try:
        assert b"brickmap-tpu" in _get(srv.port, "/")

        img = np.zeros((8, 16, 3), np.float32)
        img[:, :, 0] = 1.0
        srv.update(img, wave=3, mrays_s=1.5)

        png = _get(srv.port, "/frame.png")
        assert png.startswith(b"\x89PNG\r\n\x1a\n")

        stats = json.loads(_get(srv.port, "/stats.json"))
        assert stats["wave"] == 3
        assert stats["mrays_s"] == 1.5
        assert stats["frame_seq"] == 1

        srv.update(img * 0.5, wave=4)
        stats = json.loads(_get(srv.port, "/stats.json"))
        assert stats["frame_seq"] == 2
        assert stats["wave"] == 4
    finally:
        srv.close()
