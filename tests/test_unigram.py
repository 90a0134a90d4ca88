"""operators/unigram: SentencePiece-style Unigram-LM tokenizer —
substring seeding, Viterbi segmentation, hard-EM training, and the
Arrow apply path.

Correctness strategy mirrors test_bpe.py: hand-computable fixtures
(never hardcoded trainer internals), determinism, the required-
characters rule, the vocab-size bound, and driver==executor
segmentation agreement.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from datacanary_spark.operators import unigram as ug


def _docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, lang=lang, text=t)
                                  for i, (lang, t) in enumerate(rows)])


# ---------------------------------------------------------------------------
# substring_counts
# ---------------------------------------------------------------------------


def test_substring_counts_weighted_and_capped(spark):
    df = _docs(spark, [("en", "ab ab ba"), ("en", None)])
    got = {r["sub"]: r["sub_count"]
           for r in ug.substring_counts(df, max_len=2).collect()}
    # ab(2): a, b, ab each x2; ba(1): b, a, ba
    assert got == {"a": 3, "b": 3, "ab": 2, "ba": 1}


def test_substring_counts_max_len_limits_length(spark):
    df = _docs(spark, [("en", "abcd")])
    subs = {r["sub"] for r in ug.substring_counts(df, max_len=2).collect()}
    assert subs == {"a", "b", "c", "d", "ab", "bc", "cd"}
    with pytest.raises(ValueError):
        ug.substring_counts(df, max_len=0)


# ---------------------------------------------------------------------------
# viterbi_segment
# ---------------------------------------------------------------------------


def test_viterbi_prefers_higher_likelihood():
    logp = {"ab": math.log(0.5), "a": math.log(0.25), "b": math.log(0.25)}
    assert ug.viterbi_segment("ab", logp, max_len=2) == ("ab",)
    # 2*log(.25) = log(.0625) < log(.5): the fused token wins
    assert ug.viterbi_segment("abab", logp, max_len=2) == ("ab", "ab")


def test_viterbi_tie_breaks_fewer_tokens():
    # p(ab) == p(a)*p(b): equal score, fewer tokens must win
    logp = {"ab": math.log(0.25), "a": math.log(0.5), "b": math.log(0.5)}
    assert ug.viterbi_segment("ab", logp, max_len=2) == ("ab",)


def test_viterbi_unknown_char_fallback_and_empty():
    logp = {"a": math.log(1.0)}
    assert ug.viterbi_segment("axa", logp, max_len=2) == ("a", "x", "a")
    assert ug.viterbi_segment("", logp, max_len=2) == ()


# ---------------------------------------------------------------------------
# train_unigram
# ---------------------------------------------------------------------------


def test_train_learns_dominant_word_and_respects_bound(spark):
    corpus = " ".join(["tokenizer"] * 30 + ["ink"] * 2)
    df = _docs(spark, [("en", corpus)])
    lex = ug.train_unigram(df, vocab_size=12, max_len=9, n_iters=2)
    required = {t for t in lex if len(t) == 1}
    # required-characters rule: every char of the corpus present
    assert required == set("tokenizer" "ink")
    # the dominant word survives pruning as one token
    assert "tokenizer" in lex
    # bound: at most vocab_size - |required| multi-char tokens
    assert len(lex) - len(required) <= 12 - len(required)
    # probabilities normalize
    assert abs(sum(math.exp(p) for p in lex.values()) - 1.0) < 1e-9
    # every token is within max_len
    assert max(len(t) for t in lex) <= 9


def test_train_is_deterministic(spark):
    df = _docs(spark, [("en", "abc abd abc ab"), ("en", "bda bda cab")])
    a = ug.train_unigram(df, vocab_size=8, max_len=3, n_iters=2)
    b = ug.train_unigram(df, vocab_size=8, max_len=3, n_iters=2)
    assert a == b


def test_train_validates_args(spark):
    df = _docs(spark, [("en", "x")])
    with pytest.raises(ValueError):
        ug.train_unigram(df, vocab_size=0)
    with pytest.raises(ValueError):
        ug.train_unigram(df, vocab_size=5, prune_frac=1.0)


# ---------------------------------------------------------------------------
# apply_unigram
# ---------------------------------------------------------------------------


def test_apply_matches_driver_viterbi_and_null(spark):
    df = _docs(spark, [("en", "tokenizer ink tokenizer"), ("en", None)])
    lex = ug.train_unigram(df, vocab_size=12, max_len=9, n_iters=2)
    out = {r["doc_id"]: r["unigram_tokens"]
           for r in ug.apply_unigram(df, lex, max_len=9).collect()}
    want = [t for w in "tokenizer ink tokenizer".split(" ")
            for t in ug.viterbi_segment(w, lex, 9)]
    assert out[0] == want
    assert out[1] is None
    # round-trip invariant: tokens concatenate back to the words
    assert "".join(out[0]) == "tokenizerinktokenizer"


def test_apply_mirrors_java_whitespace_class(spark):
    # \xa0 is Unicode whitespace but NOT Java \s: it must stay inside
    # the word, exactly like words_expr / apply_bpe treat it
    df = _docs(spark, [("en", "a\xa0b a")])
    lex = {"a": math.log(0.4), "b": math.log(0.3),
           "a\xa0": math.log(0.3)}
    out = ug.apply_unigram(df, lex, max_len=2).collect()[0]["unigram_tokens"]
    assert out == ["a\xa0", "b", "a"]
