"""CLIP BPE tokenizer logic over a synthetic merges file."""
import numpy as np

from layoutllm_t2i_tpu.models.clip_tokenizer import (
    CLIPTokenizer, HashTokenizer, bytes_to_unicode, whitespace_clean,
)


def _mini_tokenizer(tmp_path):
    # HF-style merges.txt: version header + ranked merge pairs
    merges = ["#version: 0.2", "c a", "ca t", "cat</w> s"]
    path = tmp_path / "merges.txt"
    path.write_text("\n".join(merges) + "\n")
    return CLIPTokenizer(merges_path=str(path), max_length=12)


def test_bpe_merges_apply(tmp_path):
    tok = _mini_tokenizer(tmp_path)
    # 'cat' -> c a t</w> -> ca t</w> ... merge 'ca t' has rank over ('ca','t</w>')?
    pieces = tok.bpe("cat").split(" ")
    assert pieces[0].startswith("ca")
    ids = tok.encode_text("cat")
    assert all(isinstance(i, int) for i in ids)


def test_framing_and_padding(tmp_path):
    tok = _mini_tokenizer(tmp_path)
    out = tok(["cat", "a cat"])
    assert out.shape == (2, 12)
    assert (out[:, 0] == tok.sot).all()
    # eot appears and pads the tail (HF pads with eos)
    assert (out[0] == tok.eot).sum() >= 1
    assert out[0, -1] == tok.eot
    # eot position = argmax since it's the highest id
    assert out.max() == tok.eot


def test_whitespace_and_case(tmp_path):
    tok = _mini_tokenizer(tmp_path)
    a = tok(["A   Cat"])
    b = tok(["a cat"])
    np.testing.assert_array_equal(a, b)


def test_bytes_to_unicode_bijective():
    m = bytes_to_unicode()
    assert len(m) == 256
    assert len(set(m.values())) == 256


def test_hash_tokenizer_stable():
    tok = HashTokenizer(max_length=8, vocab_size=100)
    a, b = tok(["hello world"]), tok(["hello world"])
    np.testing.assert_array_equal(a, b)
    assert a.shape == (1, 8)
    assert a[0, 0] == 98 and a[0, -1] == 99
