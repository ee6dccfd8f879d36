"""Bound meteor's distance from the full Java METEOR (VERDICT r3 item 8).

The Java METEOR (pycocoevalcap, GLIGEN/clip_score.py:243-263) aligns with
four stages: exact, Porter-stem, WordNet-synonym, paraphrase-table. Ours
runs the first three (synonyms from the vendored table in eval/synonyms.py).
Neither WordNet's data files nor the paraphrase table exist in this image,
so instead of a score-vs-score comparison this script measures, on real
caption pairs, (a) how much each stage contributes and (b) how much
headroom is even LEFT for richer synonym/paraphrase data — every stage can
only match tokens the earlier stages left unmatched, so the residual
unmatched-token rate after stage 3 is a hard upper bound on what full
WordNet + paraphrases could add.

Pairs: for each NSS1K five_category caption, the most word-overlapping
OTHER caption in the split (similar scenes described by different writers —
near-paraphrase pairs from real data, no synthetic perturbations).

Prints JSON: corpus meteor under each stage prefix, per-stage match
contribution, and the residual bound. Pinned in tests/test_caption_metrics.py.
"""
from __future__ import annotations

import json
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from layoutllm_t2i_tpu.eval.caption_metrics import _meteor_align, meteor

DATA = os.environ.get("LLT2I_NSS1K_DIR", "/root/reference/data")


def build_pairs(max_pairs=400):
    with open(os.path.join(DATA, "five_category.json")) as f:
        caps = [r["captions"].lower() for r in json.load(f)]
    toksets = [set(c.split()) for c in caps]
    pairs = []
    for i, ts in enumerate(toksets):
        best_j, best_o = -1, 0.0
        for j, other in enumerate(toksets):
            if j == i:
                continue
            inter = len(ts & other)
            if not inter:
                continue
            o = inter / len(ts | other)
            if o > best_o:
                best_o, best_j = o, j
        if best_j >= 0:
            pairs.append((caps[i], caps[best_j]))
        if len(pairs) >= max_pairs:
            break
    return pairs


def main():
    pairs = build_pairs()
    cands = [c for c, _ in pairs]
    refs = [[r] for _, r in pairs]

    stage_sets = [("exact",), ("exact", "stem"), ("exact", "stem", "synonym")]
    scores = {"+".join(s): round(meteor(cands, refs, stages=s), 4)
              for s in stage_sets}

    # token-level accounting on the same pairs
    totals = Counter()
    for cand, (ref,) in zip(cands, refs):
        c, r = cand.split(), ref.split()
        prev = 0
        for s in stage_sets:
            m = len(_meteor_align(c, r, stages=s))
            totals["+".join(s)] += m - prev if s != ("exact",) else 0
            if s == ("exact",):
                totals["exact"] += m
            prev = m
        totals["tokens"] += min(len(c), len(r))
        totals["unmatched_after_syn"] += min(len(c), len(r)) - prev

    n = totals["tokens"]
    out = {
        "n_pairs": len(pairs),
        "meteor_by_stages": scores,
        "match_rate_exact": round(totals["exact"] / n, 4),
        "match_added_stem": round(totals["exact+stem"] / n, 4),
        "match_added_synonym": round(totals["exact+stem+synonym"] / n, 4),
        # hard ceiling on what full WordNet + the paraphrase table could
        # still add: the tokens all three stages left unmatched
        "residual_headroom": round(totals["unmatched_after_syn"] / n, 4),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
