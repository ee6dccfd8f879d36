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
