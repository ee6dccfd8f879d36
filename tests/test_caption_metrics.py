"""Caption metrics sanity: perfect match scores, orderings."""
from layoutllm_t2i_tpu.eval.caption_metrics import bleu, cider_d, get_all_metrics, rouge_l


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
