"""COCO-NSS1K bench runner over a synthetic split with a stub scorer."""
import json

import numpy as np
import pytest

from layoutllm_t2i_tpu.eval.nss1k import gt_layout_ltrb, load_split, run_bench
from layoutllm_t2i_tpu.pipeline.inference import InferencePipeline
from layoutllm_t2i_tpu.pipeline.loaders import random_models


class StubScorer:
    def image_features(self, imgs):
        return np.ones((len(imgs), 4), np.float32)

    def text_features(self, texts):
        return np.ones((len(texts), 4), np.float32)


def test_run_bench(tmp_path):
    data = {"id": [1], "data": [
        {"img_id": 1, "name": "a.jpg", "width": 640, "height": 480,
         "bbox": [[0.5, 0.5, 0.4, 0.4]], "label": ["dog"],
         "captions": "a dog in a park"},
        {"img_id": 2, "name": "b.jpg", "width": 640, "height": 480,
         "bbox": [[0.3, 0.3, 0.2, 0.2]], "label": ["cat"],
         "captions": "a cat on a couch"},
    ]}
    p = tmp_path / "split.json"
    p.write_text(json.dumps(data))
    examples = load_split(str(p))
    assert len(examples) == 2
    boxes, labels = gt_layout_ltrb(examples[0])
    np.testing.assert_allclose(boxes[0], [0.3, 0.3, 0.7, 0.7])
    assert labels == ["dog"]

    pipe = InferencePipeline(random_models(small=True), steps=3, sampler="plms",
                             guidance_scale=7.5)
    out = run_bench(pipe, StubScorer(), examples, batch_size=2)
    assert out["n"] == 2
    # identical unit features -> cos=1 -> clip score 2.5
    assert abs(out["clip_score_mean"] - 2.5) < 1e-5
    assert out["sec_per_image"] > 0


def test_run_bench_sharded(tmp_path):
    """prompt-DP bench path: 3 examples with batch_size 4 over an 8-device
    mesh — the ragged chunk pads to the fixed signature and the padded row
    is sliced off before scoring."""
    from layoutllm_t2i_tpu.parallel.mesh import make_mesh

    data = {"id": [1], "data": [
        {"img_id": i, "name": f"{i}.jpg", "width": 640, "height": 480,
         "bbox": [[0.5, 0.5, 0.4, 0.4]], "label": ["dog"],
         "captions": f"a dog in a park {i}"} for i in range(3)
    ]}
    p = tmp_path / "split.json"
    p.write_text(json.dumps(data))
    examples = load_split(str(p))
    pipe = InferencePipeline(random_models(small=True), steps=2, sampler="plms",
                             guidance_scale=7.5)
    out = run_bench(pipe, StubScorer(), examples, batch_size=8,
                    mesh=make_mesh(8))
    assert out["n"] == 3
    assert abs(out["clip_score_mean"] - 2.5) < 1e-5


def test_run_bench_planner_metrics(tmp_path):
    """Planner mode: per-example layout mIoU/DocSim vs GT are reported."""
    from layoutllm_t2i_tpu.eval.nss1k import run_bench

    examples = [
        {"img_id": 1, "name": "a.jpg", "width": 640, "height": 480,
         "bbox": [[0.5, 0.5, 0.4, 0.4]], "label": ["dog"],
         "captions": "a dog in a park"},
        {"img_id": 2, "name": "b.jpg", "width": 640, "height": 480,
         "bbox": [[0.3, 0.3, 0.2, 0.2]], "label": ["cat"],
         "captions": "a cat on a couch"},
    ]

    class Scorer(StubScorer):
        def _layout_ids(self, layouts, close_set):
            return [(np.asarray(b, np.float64), np.zeros(len(b), np.int32))
                    for b, _l in layouts]

    # planner predicts the exact GT layout (xywh top-left) -> perfect metrics
    def planner_fn(captions):
        out = []
        for cap in captions:
            ex = examples[0] if "dog" in cap else examples[1]
            xc, yc, w, h = ex["bbox"][0]
            out.append((list(ex["label"]), [[xc - w / 2, yc - h / 2, w, h]]))
        return out

    pipe = InferencePipeline(random_models(small=True), steps=2, sampler="plms",
                             guidance_scale=7.5)
    out = run_bench(pipe, Scorer(), examples, batch_size=2, planner_fn=planner_fn)
    assert out["layout_parsed"] == 2
    assert abs(out["layout_miou"] - 1.0) < 1e-6
    # DocSim of an exact match is area-weighted (alpha = min_area^0.5,
    # tools/metrics.py:93-125): dog 0.4^2->0.4, cat 0.2^2->0.2, mean 0.3
    assert abs(out["layout_docsim"] - 0.3) < 1e-6


def test_run_all_splits(tmp_path):
    """Per-split reporting over the five NSS1K files + weighted overall."""
    import json as _json

    from layoutllm_t2i_tpu.eval.nss1k import SPLIT_FILES, run_all_splits

    ex = {"img_id": 1, "name": "a.jpg", "width": 640, "height": 480,
          "bbox": [[0.5, 0.5, 0.4, 0.4]], "label": ["dog"],
          "captions": "a dog"}
    for fname in SPLIT_FILES.values():
        (tmp_path / fname).write_text(_json.dumps([ex]))  # bare-list schema

    pipe = InferencePipeline(random_models(small=True), steps=2, sampler="plms",
                             guidance_scale=7.5)
    out = run_all_splits(pipe, StubScorer(), str(tmp_path), batch_size=1)
    assert set(out) == set(SPLIT_FILES) | {"overall"}
    assert out["overall"]["n"] == 5
    assert abs(out["overall"]["clip_score_mean"] - 2.5) < 1e-5


def test_fast_preset_resolution():
    """nss1k --fast mirrors serve --fast (eval/nss1k.py
    resolve_fast_preset), with nss1k's steps-default-50 surface mapped
    correctly."""
    import argparse

    from layoutllm_t2i_tpu.eval.nss1k import resolve_fast_preset

    def ns(**kw):
        base = dict(sampler="plms", steps=50, cfg_interval=None,
                    cache_encoder=0, int8=False)
        base.update(kw)
        return argparse.Namespace(**base)

    from layoutllm_t2i_tpu.pipeline import presets

    a = resolve_fast_preset(ns())
    # the preset is whatever pipeline/presets.py says (single source of
    # truth, decided on chip — PERF.md round 5); int8 is NOT part of it
    # (measured as a speed loss on chip, PERF.md r4)
    assert (a.sampler, a.steps, a.cfg_interval, a.cache_encoder, a.int8) == (
        presets.FAST_SAMPLER, presets.FAST_STEPS,
        presets.fast_cfg_interval_str(), presets.FAST_CACHE_ENCODER, False)
    # explicit steps survive the preset
    a = resolve_fast_preset(ns(steps=30))
    assert a.sampler == "dpm" and a.steps == 30
    # explicit sampler keeps the 50-step default
    a = resolve_fast_preset(ns(sampler="ddim"))
    assert a.sampler == "ddim" and a.steps == 50
