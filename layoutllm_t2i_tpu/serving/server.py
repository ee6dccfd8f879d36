"""HTTP serving frontend (stdlib-only) over the MicroBatcher.

Endpoints:
  POST /generate   JSON {"prompt": str,
                         "layout": [{"phrase": str, "box": [l,t,r,b]}, ...],
                         "relations": [str, ...]?, "seed": int?,
                         "format": "png" | "json"}
                   -> image/png bytes, or JSON {"image_b64": ...}.
  GET  /healthz    -> 200 {"ok": true} once the warmup dispatch finished.
  GET  /metrics    -> batcher counters + latency percentiles.

The threading server gives each connection a thread; all of them funnel into
the single batcher worker, which is what turns concurrency into fixed-shape
TPU batches. Boxes are normalized xyxy in [0, 1] (same convention as
cli/gligen_inference --layout; reference interface.py:157-219).
"""
from __future__ import annotations

import base64
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from .batcher import MicroBatcher


def _png_bytes(img01: np.ndarray) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    arr = (np.clip(np.asarray(img01), 0, 1) * 255).astype(np.uint8)
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


class GenerationServer:
    def __init__(self, pipeline, batch_size: int = 4, max_delay_ms: float = 50.0,
                 host: str = "127.0.0.1", port: int = 8501, warmup: bool = True):
        self.batcher = MicroBatcher(pipeline, batch_size, max_delay_ms)
        self.ready = threading.Event()

        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _json(self, code: int, obj):
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/healthz":
                    ok = server.ready.is_set()
                    self._json(200 if ok else 503, {"ok": ok})
                elif self.path == "/metrics":
                    self._json(200, server.batcher.metrics())
                else:
                    self._json(404, {"error": "not found"})

            def do_POST(self):
                if self.path == "/metrics/reset":
                    server.batcher.reset_metrics()
                    return self._json(200, {"ok": True})
                if self.path != "/generate":
                    return self._json(404, {"error": "not found"})
                try:
                    length = int(self.headers.get("Content-Length", "0"))
                    req = json.loads(self.rfile.read(length) or b"{}")
                    prompt = req["prompt"]
                    layout = req.get("layout", [])
                    boxes = [item["box"] for item in layout]
                    phrases = [item["phrase"] for item in layout]
                    img = server.batcher.submit(
                        prompt, boxes, phrases,
                        relations=req.get("relations"),
                        seed=int(req.get("seed", 42)),
                        timeout=float(req.get("timeout_s", 600)),
                    )
                except KeyError as e:
                    return self._json(400, {"error": f"missing field {e}"})
                except Exception as e:
                    return self._json(500, {"error": f"{type(e).__name__}: {e}"})
                png = _png_bytes(img)
                if req.get("format", "png") == "json":
                    return self._json(200, {
                        "image_b64": base64.b64encode(png).decode()})
                self.send_response(200)
                self.send_header("Content-Type", "image/png")
                self.send_header("Content-Length", str(len(png)))
                self.end_headers()
                self.wfile.write(png)

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self.httpd.server_address[1]

        # bind the socket BEFORE warming up so deployments can probe
        # /healthz (503 until the warmup dispatch lands) instead of getting
        # connection-refused through the multi-minute SD-scale compile
        if warmup:
            def _warm():
                try:
                    self.batcher.submit("warmup", [[0.25, 0.25, 0.75, 0.75]],
                                        ["warmup"])
                finally:
                    self.ready.set()

            self._warmup_thread = threading.Thread(target=_warm, daemon=True)
            self._warmup_thread.start()
        else:
            self.ready.set()

    def serve_forever(self):
        self.httpd.serve_forever()

    def start_background(self):
        t = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        t.start()
        return t

    def shutdown(self):
        self.httpd.shutdown()
        self.httpd.server_close()
        self.batcher.close()
