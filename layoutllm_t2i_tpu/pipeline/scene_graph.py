"""Relation-triplet extraction from captions.

The reference calls sng_parser (spaCy scene-graph parser) on the host per
caption (txt2img.py:212-244, trainer_combined_layout.py:334-369). sng_parser
is an optional dependency here; when absent, a lightweight rule-based
extractor finds ``subject <prep/verb> object`` patterns — enough to exercise
the relation-aware path offline. Both return triplet strings "subj rel obj".

``relation_texts_for_inference`` reproduces the reference inference quirk
(interface.py:220-254, txt2img.py:213-244): the list starts with "PAD", the
triplets are appended TWICE, and when no relation is found the embedding
block stays all-zero (the PAD string itself is never encoded alone).
"""
from __future__ import annotations

import re
from typing import List, Optional

try:  # pragma: no cover - optional dependency
    import sng_parser  # type: ignore

    _HAS_SNG = True
except Exception:
    _HAS_SNG = False

_PREPOSITIONS = (
    "on top of|next to|in front of|on the side of|attached to|"
    "on|in|under|above|below|behind|near|beside|with|at|by|over|around|"
    "inside|outside|against|across|along|between|riding|holding|wearing|"
    "eating|chasing|watching|sitting on|standing on|lying on"
)

_ARTICLES = re.compile(r"\b(a|an|the|two|three|four|five|some|many|several)\b\s*")


def _clean_entity(s: str) -> str:
    s = _ARTICLES.sub("", s.strip().lower())
    words = [w for w in re.findall(r"[a-z]+", s)]
    return " ".join(words[-2:]) if words else ""


def _rule_based_triplets(caption: str) -> List[str]:
    triplets = []
    pattern = re.compile(
        rf"([\w\s]+?)\s+(?:is|are|was|were)?\s*({_PREPOSITIONS})\s+([\w\s]+)",
        re.IGNORECASE,
    )
    for m in pattern.finditer(caption):
        subj = _clean_entity(m.group(1))
        rel = m.group(2).strip().lower()
        obj = _clean_entity(m.group(3))
        if subj and obj and subj != obj:
            triplets.append(f"{subj} {rel} {obj}")
    return triplets


def parse_triplets(caption: str) -> List[str]:
    """Returns ["subj rel obj", ...] for a caption."""
    if _HAS_SNG:  # pragma: no cover - depends on optional package
        graph = sng_parser.parse(caption)
        entities = graph["entities"]
        out = []
        for r in graph.get("relations", []):
            obj = entities[r["object"]]["lemma_head"]
            subj = entities[r["subject"]]["lemma_head"]
            out.append(" ".join([subj, r["relation"], obj]))
        return out
    return _rule_based_triplets(caption)


def relation_texts_for_inference(caption: str, max_relas: int = 5) -> Optional[List[str]]:
    """Inference-path relation list with reference parity: ["PAD"] + triplets
    duplicated, truncated to max_relas; None when no relations (-> zero
    embeddings)."""
    triplets = parse_triplets(caption)
    if not triplets:
        return None
    relations = ["PAD"] + triplets + triplets
    return relations[:max_relas]


def relation_texts_for_training(caption: str, max_relas: int = 5) -> List[str]:
    """Trainer-path list: plain triplets, truncated (trainer_combined_layout
    .py:341-361); empty list -> zero embeddings."""
    return parse_triplets(caption)[:max_relas]
