"""Caption metrics sanity: perfect match scores, orderings."""
import os

from layoutllm_t2i_tpu.eval.caption_metrics import bleu, cider_d, get_all_metrics, rouge_l

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bleu_perfect_and_zero():
    cands = ["a dog runs in the park"]
    refs = [["a dog runs in the park"]]
    b = bleu(cands, refs)
    assert all(abs(x - 1.0) < 1e-9 for x in b)
    b0 = bleu(["xyzzy qwerty"], refs)
    assert b0[0] < 0.01


def test_bleu_partial_ordering():
    refs = [["the cat sat on the mat"]]
    close = bleu(["the cat sat on a mat"], refs)
    far = bleu(["a dog stood near some grass"], refs)
    assert close[1] > far[1]


def test_rouge_l():
    refs = [["the cat sat on the mat"]]
    assert rouge_l(["the cat sat on the mat"], refs) > 0.999
    assert rouge_l(["mat the on sat cat the"], refs) < 0.9


def test_cider_needs_corpus_contrast():
    cands = ["a dog runs", "a cat sleeps"]
    refs = [["a dog runs"], ["a cat sleeps"]]
    score = cider_d(cands, refs)
    swapped = cider_d(["a cat sleeps", "a dog runs"], refs)
    assert score > swapped


def test_get_all_metrics_keys():
    out = get_all_metrics(["a b c"], [["a b c"]])
    assert set(out) == {"bleu1", "bleu2", "bleu3", "bleu4", "rouge_l", "cider_d",
                        "meteor_lite", "spice_lite"}


def test_porter_stemmer_known_values():
    from layoutllm_t2i_tpu.eval.caption_metrics import _porter_stem

    # canonical examples from the Porter (1980) paper
    for word, stem in [("caresses", "caress"), ("ponies", "poni"),
                       ("cats", "cat"), ("feed", "feed"), ("agreed", "agre"),
                       ("plastered", "plaster"), ("motoring", "motor"),
                       ("sing", "sing"), ("conflated", "conflat"),
                       ("happy", "happi"), ("relational", "relat"),
                       ("adjustable", "adjust"), ("effective", "effect")]:
        assert _porter_stem(word) == stem, word


def test_meteor_basics():
    from layoutllm_t2i_tpu.eval.caption_metrics import meteor

    # perfect match -> near 1 (only the minimal 1-chunk penalty remains)
    s = meteor(["a dog runs in the park"], [["a dog runs in the park"]])
    assert s > 0.9
    # stem stage matches morphological variants
    s_stem = meteor(["the dog was running"], [["the dogs run"]])
    assert s_stem > 0.0
    # unrelated -> 0
    assert meteor(["xyzzy"], [["plugh"]]) == 0.0
    # word-salad scrambling is penalized vs the fluent candidate
    fluent = meteor(["a dog runs in the park"], [["a dog runs in the park"]])
    salad = meteor(["park the in runs dog a"], [["a dog runs in the park"]])
    assert salad < fluent


def test_spice_lite_orders_candidates():
    from layoutllm_t2i_tpu.eval.caption_metrics import spice_lite

    refs = [["a dog on a couch next to a table"]]
    good = spice_lite(["a dog on a couch"], refs)
    bad = spice_lite(["an empty street at night"], refs)
    assert good > bad


def test_get_all_metrics_has_meteor_and_spice():
    from layoutllm_t2i_tpu.eval.caption_metrics import get_all_metrics

    out = get_all_metrics(["a dog runs"], [["a dog runs"]])
    assert {"meteor_lite", "spice_lite"} <= set(out)
    assert out["meteor_lite"] > 0.5


def test_meteor_synonym_stage():
    """The synonym stage (vendored synset table, eval/synonyms.py) matches
    tokens the exact+stem stages cannot — Java METEOR's WordNet behavior."""
    from layoutllm_t2i_tpu.eval.caption_metrics import meteor

    cand, refs = ["a big bicycle"], [["a large bike"]]
    no_syn = meteor(cand, refs, stages=("exact", "stem"))
    with_syn = meteor(cand, refs)  # default stages include synonym
    assert with_syn > no_syn
    # big~large and bicycle~bike both match -> all 3 tokens aligned
    assert with_syn > 0.9


def test_meteor_stages_monotone():
    """Each added stage can only add matches, so corpus scores are
    non-decreasing across stage prefixes (the caption_metric_bounds.py
    invariant; measured on NSS1K pairs: 0.4412 -> 0.4454 -> 0.4467)."""
    from layoutllm_t2i_tpu.eval.caption_metrics import meteor

    cands = ["a man riding a small bike", "two dogs running on grass",
             "a photo of a large couch"]
    refs = [["a guy rides a little bicycle"], ["dogs run in the grass"],
            [["a picture of a big sofa"][0]]]
    prev = -1.0
    for stages in [("exact",), ("exact", "stem"),
                   ("exact", "stem", "synonym")]:
        s = meteor(cands, refs, stages=stages)
        assert s >= prev
        prev = s


def test_spice_lite_stopword_filter_and_bound_invariants():
    """spice_lite's unigram stage keeps content words only (Java SPICE's
    dependency parse never emits 'the' as a tuple; the unfiltered variant
    measured +0.12 inflation on NSS1K pairs — scripts/spice_bound.py, where
    the parser-agreement bracket is [0.2373, 0.4472] with the shipped score
    at lo+0.0113 and synonym headroom 0.0026)."""
    from layoutllm_t2i_tpu.eval.caption_metrics import (
        _caption_tuples,
        spice_lite,
    )

    t = _caption_tuples("the dog sat near the couch")
    assert ("the",) not in t and ("near",) not in t
    assert ("dog",) in t and ("couch",) in t and ("sat",) in t
    # keep_stopwords reproduces the pre-fix variant for the bound script
    assert ("the",) in _caption_tuples("the dog", keep_stopwords=True)
    # stopword-only agreement no longer scores
    assert spice_lite(["the and that"], [["the and with"]]) == 0.0


def test_spice_bound_script_figures():
    """Pin the spice_bound.py methodology on a tiny in-test corpus: the
    bracket brackets the shipped score, synonym matching can only add, and
    stopword unigrams can only inflate (VERDICT r4 item 7)."""
    import json
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "scripts/spice_bound.py"],
        capture_output=True, text=True, cwd=REPO,
        env={**os.environ, "LLT2I_SPICE_BOUND_MAX_PAIRS": "40"})
    assert r.returncode == 0, r.stderr
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["parser_bracket_lo"] <= out["spice_lite"] <= out["parser_bracket_hi"]
    assert out["synonym_headroom"] >= 0
    assert out["stopword_inflation"] >= 0
    assert out["triplet_contribution"] == round(
        out["spice_lite"] - out["parser_bracket_lo"], 4)


def test_synonym_json_override(tmp_path):
    """LLT2I_SYNONYM_JSON swaps in an external synset export (the
    full-WordNet fidelity hook)."""
    import importlib
    import json
    import os

    from layoutllm_t2i_tpu.eval import caption_metrics, synonyms

    p = tmp_path / "syn.json"
    p.write_text(json.dumps([["zyx", "wvu"]]))
    os.environ["LLT2I_SYNONYM_JSON"] = str(p)
    caption_metrics._SYN_IDX = None  # drop the lazy cache
    try:
        groups = synonyms.load_groups()
        assert frozenset({"zyx", "wvu"}) in groups
        s = caption_metrics.meteor(["zyx"], [["wvu"]])
        assert s > 0.4
    finally:
        del os.environ["LLT2I_SYNONYM_JSON"]
        caption_metrics._SYN_IDX = None
