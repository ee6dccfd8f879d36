"""Serving subsystem: micro-batcher coalescing + HTTP endpoints."""
import http.client
import json
import threading

import numpy as np
import pytest

from layoutllm_t2i_tpu.pipeline.inference import InferencePipeline
from layoutllm_t2i_tpu.pipeline.loaders import random_models
from layoutllm_t2i_tpu.serving.batcher import MicroBatcher
from layoutllm_t2i_tpu.serving.server import GenerationServer


@pytest.fixture(scope="module")
def pipe():
    models = random_models(seed=0, small=True)
    return InferencePipeline(models, steps=2, guidance_scale=7.5)


def test_batcher_coalesces_concurrent_requests(pipe):
    b = MicroBatcher(pipe, batch_size=2, max_delay_ms=2000)
    try:
        results = {}

        def call(i):
            results[i] = b.submit(f"prompt {i}", [[0.1, 0.1, 0.6, 0.6]],
                                  ["thing"], seed=7, timeout=600)

        threads = [threading.Thread(target=call, args=(i,)) for i in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(600)
        m = b.metrics()
        assert m["requests"] == 2
        assert m["batches"] == 1            # coalesced, not per-request
        assert m["padded_rows"] == 0
        assert m["latency_p50_ms"] > 0
        for i in range(2):
            img = np.asarray(results[i])
            assert img.ndim == 3 and img.shape[-1] == 3
        # different prompts in one batch -> different images
        assert not np.allclose(results[0], results[1])
    finally:
        b.close()


def test_per_request_seed_reproducible_across_batch_compositions(pipe):
    """A request's image is a function of ITS seed, not of how the batch was
    composed: solo (padded) vs coalesced with a stranger must match."""
    box, phrase = [[0.2, 0.2, 0.7, 0.7]], ["cat"]

    b1 = MicroBatcher(pipe, batch_size=2, max_delay_ms=10)
    try:
        solo = np.asarray(b1.submit("a cat", box, phrase, seed=5, timeout=600))
    finally:
        b1.close()

    b2 = MicroBatcher(pipe, batch_size=2, max_delay_ms=2000)
    try:
        results = {}

        def call(name, prompt, seed):
            results[name] = b2.submit(prompt, box, phrase, seed=seed,
                                      timeout=600)

        threads = [threading.Thread(target=call, args=("mine", "a cat", 5)),
                   threading.Thread(target=call, args=("other", "a dog", 9))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(600)
        assert b2.metrics()["batches"] == 1
    finally:
        b2.close()

    np.testing.assert_allclose(solo, np.asarray(results["mine"]),
                               atol=1e-5, rtol=1e-5)


def test_batcher_pads_short_batches(pipe):
    b = MicroBatcher(pipe, batch_size=2, max_delay_ms=10)
    try:
        img = b.submit("solo", [[0.2, 0.2, 0.7, 0.7]], ["cat"], timeout=600)
        assert np.asarray(img).shape[-1] == 3
        m = b.metrics()
        assert m["batches"] == 1 and m["padded_rows"] == 1
    finally:
        b.close()


def test_tp_adapter_serves_through_batcher(pipe):
    """serve --tp wiring: the TP adapter must honor the batcher's full
    generate() contract, including per-request seeds (regression: the old
    inline adapter lacked the seeds kwarg and crashed every dispatch)."""
    from layoutllm_t2i_tpu.cli.serve import TPPipeAdapter
    from layoutllm_t2i_tpu.parallel.tp import tp_mesh

    b = MicroBatcher(TPPipeAdapter(pipe, tp_mesh()), batch_size=1,
                     max_delay_ms=10)
    try:
        img = b.submit("a cat", [[0.2, 0.2, 0.7, 0.7]], ["cat"], seed=3,
                       timeout=600)
        assert np.asarray(img).ndim == 3
        assert b.metrics()["errors"] == 0
    finally:
        b.close()


def test_batcher_close_unblocks_queued_requests(pipe):
    """close() must fail queued-but-undispatched requests instead of leaving
    their submit() callers blocked forever."""
    b = MicroBatcher(pipe, batch_size=1, max_delay_ms=10)
    b.close()
    with pytest.raises(RuntimeError):
        b.submit("late", [[0.1, 0.1, 0.5, 0.5]], ["x"], timeout=5)


def test_http_server_endpoints(pipe):
    srv = GenerationServer(pipe, batch_size=2, max_delay_ms=10, port=0,
                           warmup=True)
    srv.start_background()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=600)

        # warmup is async behind a bound socket: /healthz answers 503 while
        # the warmup dispatch compiles, then flips to 200
        conn.request("GET", "/healthz")
        r = conn.getresponse()
        first = (r.status, json.loads(r.read())["ok"])
        assert first in ((503, False), (200, True))
        assert srv.ready.wait(600)
        conn.request("GET", "/healthz")
        r = conn.getresponse()
        assert r.status == 200 and json.loads(r.read())["ok"]

        body = json.dumps({
            "prompt": "a dog in a park",
            "layout": [{"phrase": "dog", "box": [0.2, 0.4, 0.5, 0.9]}],
            "relations": ["dog in park"],
            "seed": 3,
        })
        conn.request("POST", "/generate", body=body,
                     headers={"Content-Type": "application/json"})
        r = conn.getresponse()
        png = r.read()
        assert r.status == 200
        assert png[:8] == b"\x89PNG\r\n\x1a\n"   # PNG magic

        conn.request("POST", "/generate", body=json.dumps(
            {"prompt": "x", "layout": [], "format": "json"}))
        r = conn.getresponse()
        assert r.status == 200
        assert "image_b64" in json.loads(r.read())

        conn.request("POST", "/generate", body=json.dumps({"layout": []}))
        r = conn.getresponse()
        assert r.status == 400   # missing prompt

        conn.request("GET", "/metrics")
        r = conn.getresponse()
        m = json.loads(r.read())
        assert m["requests"] >= 3 and m["errors"] == 0
    finally:
        srv.shutdown()


def test_batcher_with_speed_modes():
    """The serving stack composes with the round-3 speed knobs: int8
    weights + DPM few-step sampling + guidance interval, through the real
    MicroBatcher contract (per-request seeds included)."""
    from layoutllm_t2i_tpu.pipeline.loaders import quantize_unet_int8

    models = quantize_unet_int8(random_models(seed=0, small=True),
                                min_size=128)
    pipe = InferencePipeline(models, steps=4, sampler="dpm",
                             guidance_scale=7.5, alpha_type=(0.3, 0.0, 0.7),
                             cfg_interval=(0.1, 0.85))
    b = MicroBatcher(pipe, batch_size=2, max_delay_ms=50)
    try:
        img = np.asarray(b.submit("a dog", [[0.2, 0.2, 0.8, 0.8]], ["dog"],
                                  seed=3, timeout=600))
        assert img.ndim == 3 and np.isfinite(img).all()
        img2 = np.asarray(b.submit("a dog", [[0.2, 0.2, 0.8, 0.8]], ["dog"],
                                   seed=3, timeout=600))
        np.testing.assert_array_equal(img, img2)
    finally:
        b.close()


def test_fast_preset_flag_semantics():
    """serve --fast fills in dpm-20 + cfg interval + encoder cache 2 (no
    int8 — measured slower on chip, PERF.md round 4) but never overrides a
    flag the user passed explicitly (cli/serve.py apply_fast_preset)."""
    import argparse

    from layoutllm_t2i_tpu.cli.serve import apply_fast_preset

    def ns(**kw):
        base = dict(sampler="plms", steps=None, cfg_interval=None,
                    int8=False, cache_encoder=0)
        base.update(kw)
        return argparse.Namespace(**base)

    from layoutllm_t2i_tpu.pipeline import presets

    a = apply_fast_preset(ns())
    assert (a.sampler, a.steps, a.cfg_interval, a.cache_encoder,
            a.int8) == (presets.FAST_SAMPLER, presets.FAST_STEPS,
                        presets.fast_cfg_interval_str(),
                        presets.FAST_CACHE_ENCODER, False)

    # explicit encoder-cache interval wins over the preset's 2
    a = apply_fast_preset(ns(cache_encoder=3))
    assert a.cache_encoder == 3

    # explicit sampler wins, and its steps stay user-controlled
    a = apply_fast_preset(ns(sampler="ddim", steps=None))
    assert a.sampler == "ddim" and a.steps is None

    # explicit steps win even when the sampler flips to dpm
    a = apply_fast_preset(ns(steps=30))
    assert a.sampler == "dpm" and a.steps == 30

    # explicit interval wins
    a = apply_fast_preset(ns(cfg_interval="0.2,0.9"))
    assert a.cfg_interval == "0.2,0.9"
