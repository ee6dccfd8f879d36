"""Pinned yield stats for the rule-based relation extractor on NSS1K.

The reference's relation source is sng_parser (txt2img.py:212-244); it is
absent here, so pipeline/scene_graph.py approximates it with rules. These
tests pin the measured extraction rates on the actual 943 NSS1K captions
(scripts/scene_graph_stats.py) so a regression in the extractor — the input
to the paper's novel relation-aware attention — fails loudly.

Measured 2026-08-19: only_spatial 99.0%, only_semantic 99.5%,
mix_relation 100%, non_relation 94.0% (sng_parser is similarly liberal on
possessive "of"/"with" constructs), five_category 95.4%, avg 1.7
triplets/caption. Known structural misses: idioms ("up to bat") and
verb-particle-only captions ("have ties on").
"""
import json
import os

import pytest

from layoutllm_t2i_tpu.pipeline.scene_graph import (
    parse_triplets,
    relation_texts_for_inference,
)

DATA_DIR = os.environ.get("LLT2I_NSS1K_DIR", "/root/reference/data")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA_DIR), reason="NSS1K caption data not present"
)


def _rate(split):
    with open(os.path.join(DATA_DIR, f"{split}.json")) as f:
        records = json.load(f)
    trips = [parse_triplets(r["captions"]) for r in records]
    return sum(1 for t in trips if t) / len(records), trips


def test_relation_split_recall():
    # the three relation splits are the recall proxy: their captions
    # describe relations by construction
    for split, floor in [
        ("sampled_only_spatial", 0.97),
        ("sampled_only_semantic", 0.97),
        ("mix_relation", 0.97),
    ]:
        rate, _ = _rate(split)
        assert rate >= floor, f"{split}: {rate:.3f} < {floor}"


def test_overall_yield_and_shape():
    rate, trips = _rate("five_category")
    assert rate >= 0.92
    avg = sum(len(t) for t in trips) / len(trips)
    assert 1.0 <= avg <= 3.0  # sng_parser-like density, not explosion
    for ts in trips:
        for t in ts:
            words = t.split()
            assert len(words) >= 3, t  # "subj rel obj"
            # entity heads survived cleaning (no bare determiners)
            assert words[0] not in ("a", "the", "and", "of"), t
            assert words[-1] not in ("a", "the", "and", "of"), t


def test_inference_quirk_preserved():
    # reference parity: ["PAD"] + triplets twice, truncated to max_relas
    # (interface.py:220-254); no triplets -> None (zero embeddings)
    rel = relation_texts_for_inference("a dog chasing a frisbee in a park")
    assert rel is not None and rel[0] == "PAD"
    trips = parse_triplets("a dog chasing a frisbee in a park")
    assert rel == (["PAD"] + trips + trips)[:5]
    assert relation_texts_for_inference("a sunny day") is None


def test_verb_and_prep_coverage_examples():
    # the caption patterns that drove round-4's lexicon expansion
    cases = {
        "a man riding a horse": "riding",
        "a barber cutting a boys hair": "cutting",
        "a boy throwing a frisbee": "throwing",
        "a cat sat on the mat": "sat",
        "two cars parked near a tree": "parked",
        "a large elephant standing on top of a dirt field": "standing on top of",
        "a group of giraffes inside of an enclosure": "inside of",
        "a photo of a marina": "of",
    }
    for caption, rel in cases.items():
        trips = parse_triplets(caption)
        assert any(f" {rel} " in f" {t} " for t in trips), (caption, trips)
