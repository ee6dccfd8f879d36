"""Minimal interactive demo server (reference GLIGEN/demo equivalent).

Stdlib-only HTTP app (no gradio dependency in this image): prompt + layout
boxes in, generated image with box overlay out.

Run: python -m layoutllm_t2i_tpu.cli.demo [--ckpt c.pth | --small] [--port 7860]
then open http://localhost:7860.
"""
from __future__ import annotations

import argparse
import base64
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np

_PAGE = """<!doctype html>
<html><head><title>layoutllm_t2i_tpu demo</title>
<style>body{font-family:sans-serif;max-width:720px;margin:2em auto}
textarea,input{width:100%%;margin:4px 0}img{max-width:512px;border:1px solid #ccc}
</style></head><body>
<h2>Layout-grounded generation</h2>
<form method="post" action="/generate">
<label>Prompt</label><input name="prompt" value="a dog chasing a frisbee in a park">
<label>Layout — one per line: <code>label: [x, y, w, h]</code> (normalized xywh)</label>
<textarea name="layout" rows="4">dog: [0.10, 0.30, 0.40, 0.60]
frisbee: [0.55, 0.20, 0.25, 0.25]</textarea>
<label>Seed</label><input name="seed" value="42">
<button>Generate</button></form>
%s
</body></html>"""


def build_handler(pipe, lock):
    from urllib.parse import parse_qs

    from ..pipeline.inference import convert_xywh_to_ltrb, images_to_uint8
    from ..pipeline.planner import extract_prediction
    from ..pipeline.scene_graph import relation_texts_for_inference
    from ..utils.boxes import draw_boxes_ltrb

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, html: str, code: int = 200):
            body = html.encode()
            self.send_response(code)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            self._send(_PAGE % "")

        def do_POST(self):
            length = int(self.headers.get("Content-Length", 0))
            form = parse_qs(self.rfile.read(length).decode())
            prompt = form.get("prompt", [""])[0]
            layout_text = form.get("layout", [""])[0]
            seed = int(form.get("seed", ["42"])[0])
            cats, boxes_xywh = extract_prediction(layout_text)
            boxes = [convert_xywh_to_ltrb(b) for b in boxes_xywh]
            rel = relation_texts_for_inference(prompt, pipe.models.max_relas)
            with lock:
                imgs = pipe.generate([prompt], [(boxes, cats)],
                                     relation_texts=[rel], seed=seed)
            sample = draw_boxes_ltrb(images_to_uint8(imgs)[0], boxes, cats)
            buf = io.BytesIO()
            sample.save(buf, format="PNG")
            b64 = base64.b64encode(buf.getvalue()).decode()
            result = (f"<h3>{prompt}</h3><img src='data:image/png;base64,{b64}'>"
                      f"<pre>{json.dumps(list(zip(cats, boxes_xywh)))}</pre>")
            self._send(_PAGE % result)

    return Handler


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", type=str, default=None)
    ap.add_argument("--port", type=int, default=7860)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--small", action="store_true")
    args = ap.parse_args(argv)

    from ..pipeline.inference import InferencePipeline
    from ..pipeline.loaders import load_models_from_gligen_ckpt, random_models

    models = (load_models_from_gligen_ckpt(args.ckpt) if args.ckpt
              else random_models(small=args.small))
    steps = min(args.steps, 8) if args.small else args.steps
    pipe = InferencePipeline(models, steps=steps, sampler="plms",
                             guidance_scale=7.5, alpha_type=(0.3, 0.0, 0.7))
    server = HTTPServer(("0.0.0.0", args.port), build_handler(pipe, threading.Lock()))
    print(f"demo listening on http://localhost:{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
