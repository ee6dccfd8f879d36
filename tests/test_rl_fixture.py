"""The committed RL fixture builder must produce exactly what the RL CLI
consumes: data.py-schema sample JSONs (reference data.py:14-56), images on
disk, and a layout cache whose rendered answers regex-parse back to the GT
boxes (utils.py:78-101 round trip)."""
import json
import subprocess
import sys

import numpy as np


def _build(tmp_path, n=2):
    out = tmp_path / "rl_fix"
    subprocess.run(
        [sys.executable, "scripts/make_rl_fixture.py", "--out", str(out),
         "--n", str(n)],
        check=True, cwd="/root/repo")
    return out


def test_fixture_matches_rl_data_loader(tmp_path):
    out = _build(tmp_path)
    from layoutllm_t2i_tpu.data.rl_data import RLBatches, load_rl_data

    train, cand, train_ids, cand_ids = load_rl_data(str(out), 2, 2)
    assert len(train) == len(cand) == 2
    assert train_ids == [e["img_id"] for e in train]
    for e in train + cand:
        assert set(e) >= {"img_id", "name", "width", "height", "bbox",
                          "label", "captions"}
        assert len(e["bbox"]) == len(e["label"])

    batches = list(RLBatches(train, str(out / "imgs"), batch_size=2))
    (chunk, imgs, idx), = batches
    assert imgs.shape == (2, 512, 512, 3) and imgs.dtype == np.float32
    assert 0.0 <= imgs.min() and imgs.max() <= 1.0


def test_layout_cache_roundtrips_through_planner(tmp_path):
    out = _build(tmp_path)
    from layoutllm_t2i_tpu.pipeline.planner import (
        CachedLayoutLLM, extract_prediction)

    cache = json.load(open(out / "layout_cache.json"))
    llm = CachedLayoutLLM(str(out / "layout_cache.json"))
    for caption, gt in cache.items():
        text = llm(f"input: {caption} (No explanation")
        cats, boxes = extract_prediction(text)
        assert len(cats) == len(gt)
        for (lab, box), cat, parsed in zip(gt, cats, boxes):
            # labels regex-normalize to at most two words; boxes round-trip
            # to the 2-dp precision the cache renders
            assert cat.split()[0] in lab
            np.testing.assert_allclose(parsed, box, atol=5e-3)
