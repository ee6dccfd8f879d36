"""Planner: prompt format, regex parsing, shot selection, cached LLM."""
import json

import numpy as np

from layoutllm_t2i_tpu.pipeline import planner


def test_build_prompt_format():
    shots = [{
        "captions": "two dogs on a sofa",
        "label": ["dog", "dog", "couch"],
        "bbox": [[0.3, 0.4, 0.2, 0.2], [0.7, 0.4, 0.2, 0.2], [0.5, 0.6, 0.8, 0.5]],
    }]
    p = planner.build_prompt(shots, "a cat on a table")
    assert p.startswith("Now you are an assistant")
    assert "several examples" in p
    assert "\ninput: two dogs on a sofa\n" in p
    # center -> top-left at 2dp: [0.3-0.1, 0.4-0.1, 0.2, 0.2]
    assert "dog: [0.2, 0.3, 0.2, 0.2]" in p
    assert p.rstrip().endswith("incomplete. )")
    # zero-shot variant
    p0 = planner.build_prompt([], "a cat")
    assert "several examples" not in p0 and "object: [x, y, w, h]" in p0


def test_extract_prediction():
    text = """output:
dog: [0.10, 0.20, 0.30, 0.40]
fire hydrant: [0.50, 0.60, 0.20, 0.10]
bad line: [1, 2]
"""
    cats, boxes = planner.extract_prediction(text)
    assert cats == ["dog", "fire hydrant"]
    assert boxes[0] == [0.1, 0.2, 0.3, 0.4]
    assert planner.extract_prediction("no layout here") == ([], [])


def test_shot_selection():
    scores = np.array([0.1, 0.9, 0.5, 0.2])
    assert planner.select_topk_shots(scores, 2) == [2, 1]  # reversed top-k
    rng = np.random.default_rng(0)
    s = planner.sample_shots(np.array([0.25, 0.25, 0.25, 0.25]), 2, rng)
    assert len(set(s)) == 2


def test_cached_layout_llm(tmp_path):
    cache = {"a cat on a table": [["cat", [0.2, 0.2, 0.3, 0.3]],
                                  ["table", [0.1, 0.6, 0.8, 0.3]]]}
    path = tmp_path / "cache.json"
    path.write_text(json.dumps(cache))
    llm = planner.CachedLayoutLLM(str(path))
    prompt = planner.build_prompt([], "a cat on a table")
    out = llm(prompt)
    cats, boxes = planner.extract_prediction(out)
    assert cats == ["cat", "table"]
    assert boxes[1] == [0.1, 0.6, 0.8, 0.3]


def test_center2lefttop():
    assert planner.center2lefttop([[0.5, 0.5, 0.2, 0.4]]) == [[0.4, 0.3, 0.2, 0.4]]
