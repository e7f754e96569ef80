"""Live HTTP preview of a progressive render.

The reference presents frames in a GLFW window with an ImGui stats panel
(``main.cpp:26-190``, ``main.cpp:154-175``); on a headless TPU host the
equivalent is a tiny dependency-free HTTP server: the render loop pushes
each progressive frame (PNG bytes + stats) and any browser pointed at the
port sees a self-refreshing view.  Serving is read-only and decoupled from
the render loop — a slow or absent viewer never blocks a wave.

Routes:

* ``/``           — HTML page: the frame image + live stats, refreshed by JS.
* ``/frame.png``  — latest progressive frame (no-cache).
* ``/stats.json`` — latest wave stats (wave index, Mrays/s, spp, ...).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

__all__ = ["PreviewServer"]

_PAGE = b"""<!doctype html>
<html><head><title>brickmap-tpu live preview</title>
<style>
 body { background:#111; color:#ddd; font-family:monospace; margin:1em; }
 img  { max-width:100%; image-rendering:pixelated; border:1px solid #333; }
 #stats { margin:0.5em 0; white-space:pre; }
</style></head><body>
<div id="stats">waiting for first frame...</div>
<img id="frame" src="/frame.png">
<script>
 async function tick() {
   try {
     const r = await fetch('/stats.json', {cache: 'no-store'});
     const s = await r.json();
     document.getElementById('stats').textContent =
       Object.entries(s).map(([k, v]) => k + ': ' + v).join('   ');
     if (s.frame_seq !== window._seq) {
       window._seq = s.frame_seq;
       document.getElementById('frame').src = '/frame.png?' + s.frame_seq;
     }
   } catch (e) {}
   setTimeout(tick, 500);
 }
 tick();
</script></body></html>
"""


class PreviewServer:
    """Background HTTP server showing the latest pushed frame.

    ``update(img, **stats)`` is called from the render loop with a float
    [H, W, 3] image (or uint8); encoding happens on the caller's thread
    (cheap vs a render wave), serving on daemon threads.
    """

    def __init__(self, port: int, host: str = "0.0.0.0"):
        from .image import encode_png

        self._encode = encode_png
        self._lock = threading.Lock()
        self._png = b""
        self._stats: dict = {"frame_seq": 0}
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self):  # noqa: N802 (stdlib API name)
                path = self.path.split("?")[0]
                if path == "/":
                    body, ctype = _PAGE, "text/html"
                elif path == "/frame.png":
                    with outer._lock:
                        body = outer._png
                    ctype = "image/png"
                    if not body:
                        self.send_response(404)
                        self.end_headers()
                        return
                elif path == "/stats.json":
                    with outer._lock:
                        body = json.dumps(outer._stats).encode()
                    ctype = "application/json"
                else:
                    self.send_response(404)
                    self.end_headers()
                    return
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.send_header("Cache-Control", "no-store")
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):  # quiet: no per-request stderr spam
                pass

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self._httpd.server_address[1]   # resolved (port=0 ok)
        self._thread = threading.Thread(target=self._httpd.serve_forever,
                                        daemon=True)
        self._thread.start()

    def update(self, img, **stats) -> None:
        png = self._encode(img)
        with self._lock:
            self._png = png
            seq = self._stats.get("frame_seq", 0) + 1
            self._stats = {**stats, "frame_seq": seq}

    def close(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
