"""Tokenizer golden tests against the reference's `words_preprocess`
semantics (reference preprocess.py:276-292) and vocab/encode behavior."""

import numpy as np

from imagecaptioning_tpu.data.tokenizer import (
    Vocab, build_vocab, build_vocab_dict, words_preprocess)


def test_words_preprocess_basic():
    assert words_preprocess("A man, smiling!") == ["a", "man", "smiling"]
    assert words_preprocess("Hello   world") == ["hello", "world"]


def test_words_preprocess_unicode_replacements():
    assert words_preprocess("café") == ["cafe"]
    assert words_preprocess("90° turn") == ["90", "degree", "turn"]
    assert words_preprocess("½ cup") == ["half", "cup"]
    assert words_preprocess("fiancé—tall") == ["fiancetall"]
    # è is translated (not deleted) by the punctuation table
    assert words_preprocess("crème") == ["creme"]


def test_words_preprocess_strips_all_ascii_punctuation():
    assert words_preprocess("it's a test-case.") == ["its", "a", "testcase"]


def test_build_vocab_min_count_and_unk():
    lists = [["a", "b"], ["a", "c"], ["a", "b"], None]
    vocab = build_vocab(lists, min_token_instances=2)
    assert "a" in vocab and "b" in vocab
    assert "c" not in vocab
    assert "<UNK>" in vocab  # something was dropped
    vocab_all = build_vocab(lists, min_token_instances=1)
    assert "<UNK>" not in vocab_all  # nothing dropped


def test_vocab_dict_one_indexed():
    t2i, i2t = build_vocab_dict({"b", "a"})
    assert sorted(t2i.values()) == [1, 2]
    assert i2t[str(t2i["a"])] == "a"


def test_encode_decode_roundtrip():
    v = Vocab.from_captions(
        ["a man with a beard", "a man with a hat", "a man with a smile"],
        min_token_instances=2)
    row = v.encode_caption("a man with a beard", seq_length=8)
    assert row.dtype == np.int32
    assert row.shape == (8,)
    # 'beard' appears once → <UNK>
    decoded = v.decode_row(row)
    assert decoded.startswith("a man with a")
    assert "<UNK>" in decoded


def test_special_token_layout():
    v = Vocab({"x": 1, "y": 2})
    assert v.vocab_size == 2
    assert v.start_token == 3 and v.end_token == 4
    assert v.num_embeddings == 5


def test_decode_stops_at_end_and_null():
    v = Vocab({"x": 1, "y": 2})
    assert v.decode_row([1, 2, v.end_token, 1]) == "x y"
    assert v.decode_row([1, 0, 2]) == "x"
    assert v.decode_sequence(np.array([[1, 2, 0], [2, 2, 2]])) == ["x y", "y y y"]


def test_decode_sequence_3d():
    from imagecaptioning_tpu.data.tokenizer import Vocab
    v = Vocab({"a": 1, "b": 2})
    seq = np.array([[[1, 2, 0], [2, v.end_token, 1]],
                    [[2, 2, 2], [1, 0, 0]]])
    out = v.decode_sequence(seq)
    assert out == [["a b", "b"], ["b b b", "a"]]
