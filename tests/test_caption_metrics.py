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
    assert set(out) == {"bleu1", "bleu2", "bleu3", "bleu4", "rouge_l", "cider_d"}
