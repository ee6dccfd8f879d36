"""Caption-overlap metrics: BLEU-1..4, ROUGE-L, CIDEr-D.

Reference capability: GLIGEN/clip_score.py get_all_metrics (via
pycocoevalcap). Re-implemented from the metric definitions in pure Python —
METEOR and SPICE require external models/Java and are intentionally omitted.

Inputs are pre-tokenized lowercase strings; candidates: list[str],
references: list[list[str]].
"""
from __future__ import annotations

import math
from collections import Counter, defaultdict
from typing import Dict, List


def _ngrams(tokens: List[str], n: int) -> Counter:
    return Counter(tuple(tokens[i:i + n]) for i in range(len(tokens) - n + 1))


def bleu(candidates: List[str], references: List[List[str]], max_n: int = 4) -> List[float]:
    """Corpus BLEU-1..max_n with the standard brevity penalty."""
    clipped = [0] * max_n
    totals = [0] * max_n
    cand_len = 0
    ref_len = 0
    for cand, refs in zip(candidates, references):
        c = cand.lower().split()
        rs = [r.lower().split() for r in refs]
        cand_len += len(c)
        ref_len += min((abs(len(r) - len(c)), len(r)) for r in rs)[1]
        for n in range(1, max_n + 1):
            cg = _ngrams(c, n)
            max_ref = Counter()
            for r in rs:
                rg = _ngrams(r, n)
                for g, cnt in rg.items():
                    max_ref[g] = max(max_ref[g], cnt)
            clipped[n - 1] += sum(min(cnt, max_ref[g]) for g, cnt in cg.items())
            totals[n - 1] += max(sum(cg.values()), 0)
    bp = 1.0 if cand_len > ref_len else math.exp(1 - ref_len / max(cand_len, 1))
    scores = []
    log_sum = 0.0
    for n in range(max_n):
        p = clipped[n] / totals[n] if totals[n] else 0.0
        log_sum += math.log(p) if p > 0 else -9e9
        scores.append(bp * math.exp(log_sum / (n + 1)))
    return scores


def _lcs_len(a: List[str], b: List[str]) -> int:
    dp = [0] * (len(b) + 1)
    for x in a:
        prev = 0
        for j, y in enumerate(b, 1):
            cur = dp[j]
            dp[j] = prev + 1 if x == y else max(dp[j], dp[j - 1])
            prev = cur
    return dp[-1]


def rouge_l(candidates: List[str], references: List[List[str]],
            beta: float = 1.2) -> float:
    """Mean ROUGE-L F-beta over examples (max over references)."""
    scores = []
    for cand, refs in zip(candidates, references):
        c = cand.lower().split()
        best = 0.0
        for ref in refs:
            r = ref.lower().split()
            lcs = _lcs_len(c, r)
            if lcs == 0:
                continue
            prec = lcs / len(c)
            rec = lcs / len(r)
            f = (1 + beta ** 2) * prec * rec / (rec + beta ** 2 * prec)
            best = max(best, f)
        scores.append(best)
    return sum(scores) / max(len(scores), 1)


def cider_d(candidates: List[str], references: List[List[str]], max_n: int = 4,
            sigma: float = 6.0) -> float:
    """CIDEr-D: tf-idf weighted n-gram cosine with length gaussian penalty."""
    # document frequency over reference sets
    df: Dict[tuple, int] = defaultdict(int)
    ref_grams = []
    for refs in references:
        seen = set()
        per_ref = []
        for ref in refs:
            toks = ref.lower().split()
            grams = [_ngrams(toks, n) for n in range(1, max_n + 1)]
            per_ref.append((toks, grams))
            for g in grams:
                seen.update(g.keys())
        ref_grams.append(per_ref)
        for g in seen:
            df[g] += 1
    n_docs = max(len(references), 1)

    def tfidf_vec(grams: Counter, length: int):
        vec = {}
        norm = 0.0
        for g, cnt in grams.items():
            idf = math.log(max(n_docs, 1)) - math.log(max(df[g], 1))
            w = (cnt / max(length, 1)) * idf if length else 0.0
            vec[g] = w
            norm += w * w
        return vec, math.sqrt(norm)

    scores = []
    for cand, per_ref in zip(candidates, ref_grams):
        c = cand.lower().split()
        c_grams = [_ngrams(c, n) for n in range(1, max_n + 1)]
        score_n = [0.0] * max_n
        for r_toks, r_grams in per_ref:
            delta = len(c) - len(r_toks)
            penalty = math.exp(-(delta ** 2) / (2 * sigma ** 2))
            for n in range(max_n):
                cv, cn = tfidf_vec(c_grams[n], len(c))
                rv, rn = tfidf_vec(r_grams[n], len(r_toks))
                dot = sum(min(cv[g], rv.get(g, 0.0)) * rv.get(g, 0.0)
                          for g in cv)
                if cn > 0 and rn > 0:
                    score_n[n] += penalty * dot / (cn * rn)
        k = max(len(per_ref), 1)
        scores.append(10.0 * sum(s / k for s in score_n) / max_n)
    return sum(scores) / max(len(scores), 1)


def get_all_metrics(candidates: List[str], references: List[List[str]]) -> Dict[str, float]:
    b = bleu(candidates, references)
    return {
        "bleu1": b[0], "bleu2": b[1], "bleu3": b[2], "bleu4": b[3],
        "rouge_l": rouge_l(candidates, references),
        "cider_d": cider_d(candidates, references),
    }
