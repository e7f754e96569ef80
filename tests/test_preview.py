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


def _post(port, path, payload):
    req = urllib.request.Request(f"http://127.0.0.1:{port}{path}",
                                 data=json.dumps(payload).encode(),
                                 method="POST")
    with urllib.request.urlopen(req, timeout=5) as r:
        return r.status


def test_preview_camera_input_accumulates_and_drains():
    srv = PreviewServer(0, host="127.0.0.1")
    try:
        assert srv.pop_camera() is None
        assert _post(srv.port, "/camera",
                     {"move": [1.0, 0.0, 0.5], "rot": [0.1, 0.0]}) == 204
        assert _post(srv.port, "/camera",
                     {"move": [0.5, -1.0, 0.0], "rot": [0.0, -0.2]}) == 204
        d = srv.pop_camera()
        assert d is not None
        np.testing.assert_allclose(d["move"], [1.5, -1.0, 0.5])
        np.testing.assert_allclose(d["rot"], [0.1, -0.2])
        assert srv.pop_camera() is None          # drained
    finally:
        srv.close()


def test_apply_camera_input_moves_and_turns():
    from brickmap_tpu.app.cli import _apply_camera_input
    from brickmap_tpu.render.camera import Camera

    cam = Camera(position=(10.0, 10.0, 10.0), direction=(0.0, 1.0, 0.0))
    # Pure forward move: position advances along +y, direction unchanged.
    c2 = _apply_camera_input(cam, {"move": [2.0, 0.0, 0.0],
                                   "rot": [0.0, 0.0]}, move_scale=1.0)
    np.testing.assert_allclose(c2.position, (10.0, 12.0, 10.0), atol=1e-6)
    np.testing.assert_allclose(c2.direction, (0.0, 1.0, 0.0), atol=1e-6)
    # Quarter yaw turn: now facing +x (camera.cpp yaw convention).
    c3 = _apply_camera_input(c2, {"move": [0.0, 0.0, 0.0],
                                  "rot": [np.pi / 2, 0.0]}, move_scale=1.0)
    np.testing.assert_allclose(c3.direction, (1.0, 0.0, 0.0), atol=1e-6)
    # Up impulse is world-up regardless of pitch.
    c4 = _apply_camera_input(c3, {"move": [0.0, 0.0, 3.0],
                                  "rot": [0.0, 0.0]}, move_scale=2.0)
    np.testing.assert_allclose(c4.position[2], c3.position[2] + 6.0)
