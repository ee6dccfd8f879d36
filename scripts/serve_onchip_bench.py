"""On-chip serving proof (VERDICT r3 item 5): start cli.serve against the
real chip, record warmup time and steady-state p50/p99.

For each config this script: spawns the server subprocess, polls /healthz
(the 503->200 flip times the cold compile + warmup dispatch), fires
concurrent /generate requests (client-side latency), reads /metrics
(server-side percentiles from the batcher), logs one JSON line, then shuts
the server down with SIGINT (clean KeyboardInterrupt -> srv.shutdown(); a
hard kill would wedge the chip lease).

TPU etiquette: one chip process at a time — each config restarts the
server, and the NEXT claim can block ~10 min on lease-release lag
(tpu-bench-traps), so the config list is short.

Results append to /tmp/serve_onchip.jsonl.
"""
from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import threading
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.environ.get("LLT2I_SERVE_BENCH_OUT", "/tmp/serve_onchip.jsonl")

CONFIGS = [
    # (name, extra args, n_requests, concurrency)
    ("default_b4", ["--batch", "4"], 12, 4),
    ("fast_b4", ["--fast", "--batch", "4"], 12, 4),
    # identical args re-run: with the persistent compile cache now on by
    # default (PERF.md r5), the second launch's warmup_s IS the warm-restart
    # cost (VERDICT r4 item 2). Run right after its cold twin.
    ("fast_b4_warm", ["--fast", "--batch", "4"], 12, 4),
    ("default_b4_warm", ["--batch", "4"], 12, 4),
]
if os.environ.get("LLT2I_SERVE_BENCH_SMALL") == "1":  # CPU smoke of the
    # script mechanics (threads/healthz/metrics/SIGINT), not a measurement
    CONFIGS = [(n, e + ["--small"], 4, 2) for n, e, _, _ in CONFIGS[:1]]


def log(rec):
    line = json.dumps(rec)
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def _get(url, timeout=5):
    with urllib.request.urlopen(url, timeout=timeout) as r:
        return json.loads(r.read())


def _post_generate(port, seed, lat_out):
    body = json.dumps({
        "prompt": "a dog chasing a frisbee in a park",
        "layout": [{"phrase": "dog", "box": [0.1, 0.3, 0.5, 0.9]},
                   {"phrase": "frisbee", "box": [0.55, 0.2, 0.9, 0.5]}],
        "seed": seed, "format": "json",
    }).encode()
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/generate", data=body,
        headers={"Content-Type": "application/json"})
    t0 = time.time()
    with urllib.request.urlopen(req, timeout=1800) as r:
        ok = bool(json.loads(r.read()).get("image_b64"))
    lat_out.append((time.time() - t0, ok))


def run_config(name, extra, n_req, conc, port):
    t_start = time.time()
    proc = subprocess.Popen(
        [sys.executable, "-m", "layoutllm_t2i_tpu.cli.serve",
         "--port", str(port)] + extra,
        cwd=REPO, stdout=subprocess.DEVNULL, stderr=subprocess.STDOUT)
    try:
        # healthz: 503 (connection may also refuse briefly) until the warmup
        # dispatch lands; SD-scale cold compiles run many minutes
        warmup_s = None
        deadline = time.time() + 3600
        while time.time() < deadline:
            if proc.poll() is not None:
                log({"config": name, "error": "server exited during warmup"})
                return
            try:
                if _get(f"http://127.0.0.1:{port}/healthz").get("ok"):
                    warmup_s = round(time.time() - t_start, 1)
                    break
            except Exception:
                pass
            time.sleep(5)
        if warmup_s is None:
            log({"config": name, "error": "warmup timeout (1h)"})
            return

        # drop the warmup request from the percentile window
        urllib.request.urlopen(urllib.request.Request(
            f"http://127.0.0.1:{port}/metrics/reset", data=b""), timeout=10)

        lats = []
        threads = []
        for i in range(n_req):
            t = threading.Thread(target=_post_generate,
                                 args=(port, 100 + i, lats))
            t.start()
            threads.append(t)
            # stagger within a batch window so requests coalesce
            if (i + 1) % conc == 0:
                for t in threads:
                    t.join()
                threads = []
        for t in threads:
            t.join()

        metrics = _get(f"http://127.0.0.1:{port}/metrics")
        client = sorted(l for l, ok in lats if ok)
        rec = {
            "config": name, "warmup_s": warmup_s,
            "n_ok": len(client), "n_req": n_req,
            "client_p50_s": round(client[len(client) // 2], 2) if client else None,
            "client_max_s": round(client[-1], 2) if client else None,
            "metrics": metrics,
        }
        log(rec)
    finally:
        proc.send_signal(signal.SIGINT)
        try:
            proc.wait(timeout=120)
        except subprocess.TimeoutExpired:
            log({"config": name, "warn": "SIGINT not honored in 120s; "
                 "leaving process to exit on its own (never hard-kill a "
                 "chip process)"})


def main():
    only = set(sys.argv[1:])
    port = 8621
    for name, extra, n_req, conc in CONFIGS:
        if only and name not in only:
            continue
        run_config(name, extra, n_req, conc, port)
        port += 1
        time.sleep(10)


if __name__ == "__main__":
    main()
