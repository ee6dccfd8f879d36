"""bench.py CLI contract: one JSON line per mode, correct metric keys.

The driver consumes the default mode's single JSON line (BENCH_r{N}.json);
--latency and --sharded are the PERF.md modes. All run --small on CPU.
"""
import json
import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(*flags):
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, "bench.py", "--small", "--iters", "1", *flags],
        cwd=_REPO, env=env, capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    assert len(lines) == 1, out.stdout
    return json.loads(lines[0])


def test_bench_default_contract():
    rec = _run()
    assert rec["metric"] == "images_per_sec_per_chip"
    assert rec["unit"] == "img/s"
    assert rec["value"] > 0
    assert rec["vs_baseline"] == pytest.approx(rec["value"] / 8.0, rel=1e-3)
    # dual mode: the default invocation also measures the --fast preset in
    # the same process, with a LIVE decoded-image PSNR quality gate
    assert rec["fast_value"] > 0
    assert rec["fast_vs_baseline"] == pytest.approx(
        rec["fast_value"] / 8.0, rel=1e-3)
    assert rec["fast_psnr_vs_exact_db"] > 0


def test_bench_no_fast_skips_second_headline():
    rec = _run("--no_fast")
    assert rec["metric"] == "images_per_sec_per_chip"
    assert "fast_value" not in rec


def test_bench_latency_mode():
    rec = _run("--latency")
    assert rec["metric"] == "image_latency_steady_state_mean"
    assert rec["unit"] == "s/img"
    assert rec["value"] > 0


def test_bench_sharded_mode():
    env_batch = ["--batch", "8"]  # divides the 8-device CPU mesh
    rec = _run("--sharded", *env_batch)
    assert rec["metric"] == "images_per_sec_per_chip"
    assert rec["value"] > 0
