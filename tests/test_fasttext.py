"""fastText binary-format reader: hashing, subword enumeration, round trip.

Oracle anchors: FNV-1a-32 public test vectors for the hash; the fastText
paper/docs' "where" example for n-gram enumeration; a self-written .bin
fixture (ha2g_tpu.data.fasttext_bin.write_model emits the exact
FastText::loadModel layout) for the end-to-end path the reference drives
through fasttext.load_model (scripts/model/vocab.py:70-84)."""

import numpy as np
import pytest

from ha2g_tpu.data import fasttext_bin as ft
from ha2g_tpu.data.vocab import Vocab


def test_hash_matches_fnv1a_test_vectors():
    # standard FNV-1a 32-bit vectors (ASCII has no signed-char effect)
    assert ft.ft_hash(b"") == 2166136261
    assert ft.ft_hash(b"a") == 0xE40C292C
    assert ft.ft_hash(b"foobar") == 0xBF9CF968


def test_hash_signed_char_quirk():
    # fastText xors the *sign-extended* byte (Dictionary::hash casts to
    # int8_t); independently recompute with numpy int8 semantics
    data = "é".encode("utf-8")  # bytes >= 0x80
    h = np.uint32(2166136261)
    with np.errstate(over="ignore"):  # uint32 wraparound is the point
        for b in np.frombuffer(data, np.int8):
            h = np.uint32(h ^ np.uint32(np.int32(b)))
            h = np.uint32(h * np.uint32(16777619))
    assert ft.ft_hash(data) == int(h)
    # and differs from the unsigned interpretation
    h_unsigned = 2166136261
    for b in data:
        h_unsigned = ((h_unsigned ^ b) * 16777619) & 0xFFFFFFFF
    assert ft.ft_hash(data) != h_unsigned


def test_subword_enumeration_where_example():
    # the canonical fastText docs example: "where", minn=maxn=3 ->
    # <wh, whe, her, ere, re>
    got = ft.compute_subword_hashes(b"<where>", 3, 3)
    want = [ft.ft_hash(g) for g in [b"<wh", b"whe", b"her", b"ere", b"re>"]]
    assert got == want


def test_subword_enumeration_skips_trivial_unigrams():
    # n==1 grams at the word edges (the bare BOW/EOW) are excluded
    got = ft.compute_subword_hashes(b"<ab>", 1, 2)
    want = [ft.ft_hash(g) for g in
            [b"<a", b"a", b"ab", b"b", b"b>"]]
    assert got == want


def test_subword_enumeration_utf8_codepoints():
    # é is 2 bytes but one codepoint; 3-grams of <café>
    got = ft.compute_subword_hashes("<café>".encode("utf-8"), 3, 3)
    grams = ["<ca", "caf", "afé", "fé>"]
    assert got == [ft.ft_hash(g.encode("utf-8")) for g in grams]


@pytest.fixture()
def tiny_model(tmp_path):
    words = ["</s>", "hello", "world", "café"]
    bucket = 64
    rng = np.random.default_rng(7)
    matrix = rng.normal(size=(len(words) + bucket, 8)).astype(np.float32)
    path = tmp_path / "tiny.bin"
    ft.write_model(path, words, matrix, bucket=bucket, minn=3, maxn=4,
                   counts=[100, 5, 4, 3])
    return path, words, matrix, bucket


def test_bin_round_trip(tiny_model):
    path, words, matrix, bucket = tiny_model
    m = ft.load_model(path)
    assert m.words == words and m.dim == 8 and m.bucket == bucket
    assert m.counts == [100, 5, 4, 3]
    np.testing.assert_allclose(np.asarray(m.input), matrix)


def test_word_vector_in_vocab_is_mean_of_word_and_ngram_rows(tiny_model):
    path, words, matrix, bucket = tiny_model
    m = ft.load_model(path)
    ids = m.subword_ids("hello")
    assert ids[0] == words.index("hello")
    hashes = ft.compute_subword_hashes(b"<hello>", 3, 4)
    assert ids[1:] == [len(words) + h % bucket for h in hashes]
    np.testing.assert_allclose(m.get_word_vector("hello"),
                               matrix[ids].mean(0), rtol=1e-6)


def test_word_vector_oov_uses_ngrams_only(tiny_model):
    path, words, matrix, bucket = tiny_model
    m = ft.load_model(path)
    ids = m.subword_ids("goodbye")
    assert all(i >= len(words) for i in ids) and ids
    v = m.get_word_vector("goodbye")
    assert np.abs(v).sum() > 0
    np.testing.assert_allclose(v, matrix[ids].mean(0), rtol=1e-6)


def test_eos_uses_own_row_only(tiny_model):
    path, words, matrix, _ = tiny_model
    m = ft.load_model(path)
    np.testing.assert_allclose(m.get_word_vector("</s>"), matrix[0])


def test_vocab_load_word_vectors_bin(tiny_model, tmp_path):
    path, words, matrix, _ = tiny_model
    v = Vocab("words")
    for w in ["hello", "world", "unseen"]:
        v.index_word(w)
    v.load_word_vectors(path, 8)
    W = v.word_embedding_weights
    assert W.shape == (v.n_words, 8)
    m = ft.load_model(path)
    np.testing.assert_allclose(W[v.word2index["hello"]],
                               m.get_word_vector("hello"), rtol=1e-6)
    # OOV vocab word still gets a subword vector (the fastText property
    # the reference relies on)
    np.testing.assert_allclose(W[v.word2index["unseen"]],
                               m.get_word_vector("unseen"), rtol=1e-6)


def test_vocab_load_word_vectors_vec_text(tmp_path):
    p = tmp_path / "mini.vec"
    p.write_text("2 4\nhello 1 2 3 4\nworld -1 0 0.5 2\n")
    v = Vocab("words")
    v.index_word("hello")
    v.index_word("absent")
    v.load_word_vectors(p, 4)
    np.testing.assert_allclose(v.word_embedding_weights[v.word2index["hello"]],
                               [1, 2, 3, 4])
    # absent word keeps the N(0, 1/sqrt(dim)) init
    assert np.abs(v.word_embedding_weights[v.word2index["absent"]]).max() < 3


def test_load_model_rejects_non_fasttext(tmp_path):
    p = tmp_path / "bogus.bin"
    p.write_bytes(b"\x00" * 64)
    with pytest.raises(ValueError, match="magic"):
        ft.load_model(p)
