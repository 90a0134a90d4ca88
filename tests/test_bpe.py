"""operators/bpe: distributed BPE pair counting, merge learning,
and tokenization.

Correctness strategy: the Sennrich-2016 toy corpus with a NAIVE
pure-Python reference trainer computed inline (never hardcoded merge
lists — the reference derives them the textbook way, the operator must
agree); the GPT-2 invariant that greedy lowest-rank application
reproduces the training segmentation; determinism; and the contract
edge cases (single-char words, null text, empty corpus, early stop).
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from datacanary_spark.operators import bpe

# the classic BPE walkthrough corpus (Sennrich et al. 2016 §3.2),
# spelled as documents so the word counts come out to the paper's
# {low:5, lower:2, newest:6, widest:3}
_SENNRICH_DOCS = [
    ("en", " ".join(["low"] * 5 + ["lower"] * 2)),
    ("en", " ".join(["newest"] * 6 + ["widest"] * 3)),
]


def _docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, lang=lang, text=t)
                                  for i, (lang, t) in enumerate(rows)])


def _naive_learn(word_freq: dict[str, int], num_merges: int):
    """Textbook BPE trainer: count pairs over symbol sequences, merge
    the most frequent (ties: lexicographically smallest pair)."""
    vocab = {tuple(w): c for w, c in word_freq.items()}
    merges = []
    for _ in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for sym, c in vocab.items():
            for p in zip(sym, sym[1:]):
                counts[p] = counts.get(p, 0) + c
        if not counts:
            break
        best = min(counts, key=lambda p: (-counts[p], p))
        merges.append(best)
        vocab = {bpe._merge_seq(s, *best): c for s, c in vocab.items()}
    return merges, vocab


# ---------------------------------------------------------------------------
# word_freqs / pair_counts
# ---------------------------------------------------------------------------


def test_word_freqs_counts_and_null_text(spark):
    df = _docs(spark, [("en", "low low lower"), ("en", None)])
    got = {r["w"]: r["c"] for r in bpe.word_freqs(df).collect()}
    assert got == {"low": 2, "lower": 1}


def test_pair_counts_weighted_and_single_char_guard(spark):
    wf = spark.createDataFrame([Row(w="ab", c=3), Row(w="a", c=7),
                                Row(w="abc", c=1)])
    got = {r["pair"]: r["pair_count"] for r in bpe.pair_counts(wf).collect()}
    # "a" (len 1) contributes nothing; ab: 3 (from "ab") + 1 (from "abc")
    assert got == {"ab": 4, "bc": 1}


def test_top_pairs_by_group_deterministic_rank(spark):
    df = _docs(spark, _SENNRICH_DOCS)
    out = bpe.top_pairs_by_group(df, "text", "lang", k=3).collect()
    ranked = sorted((r["rank"], r["pair"], r["pair_count"]) for r in out)
    # es/st appear in newest(6)+widest(3)=9 each; tie broken pair-asc;
    # we appears in lower(2)+newest(6)=8
    assert ranked[0] == (1, "es", 9)
    assert ranked[1] == (2, "st", 9)
    assert ranked[2] == (3, "we", 8)


# ---------------------------------------------------------------------------
# learn_bpe_merges
# ---------------------------------------------------------------------------


def test_learn_matches_naive_reference(spark):
    df = _docs(spark, _SENNRICH_DOCS)
    want, _ = _naive_learn({"low": 5, "lower": 2, "newest": 6, "widest": 3},
                           num_merges=10)
    got = bpe.learn_bpe_merges(df, num_merges=10)
    assert got == want
    # the paper's first merges on this corpus
    assert got[:2] == [("e", "s"), ("es", "t")]


def test_learn_deterministic_and_early_stop(spark):
    df = _docs(spark, [("en", "ab ab ba")])
    a = bpe.learn_bpe_merges(df, num_merges=50)
    b = bpe.learn_bpe_merges(df, num_merges=50)
    assert a == b
    # vocabulary fully merges after 2 merges ("ab" and "ba") -> early stop
    assert len(a) == 2


def test_learn_max_vocab_cap_is_deterministic(spark):
    df = _docs(spark, [("en", "aa bb aa cc bb aa")])
    # cap to the 2 most frequent words: aa(3), bb(2) — cc excluded
    got = bpe.learn_bpe_merges(df, num_merges=3, max_vocab=2)
    want, _ = _naive_learn({"aa": 3, "bb": 2}, num_merges=3)
    assert got == want


def test_learn_rejects_negative(spark):
    df = _docs(spark, [("en", "x")])
    with pytest.raises(ValueError):
        bpe.learn_bpe_merges(df, num_merges=-1)


@given(st.dictionaries(
    st.text(alphabet="abc", min_size=1, max_size=8),
    st.integers(min_value=1, max_value=9),
    min_size=0, max_size=12))
@settings(max_examples=200, deadline=None)
def test_incremental_trainer_equals_naive_recurrence(word_freq):
    """The heap/index incremental trainer (_learn_from_vocab) must
    reproduce the textbook from-scratch recurrence EXACTLY — including
    overlapping self-pairs like ('a','a') on runs, count ties broken by
    lexicographic pair order, and early stop on a fully-merged vocab.
    The 3-letter alphabet maximizes pair collisions and re-additions."""
    want, _ = _naive_learn(dict(word_freq), num_merges=25)
    got = bpe._learn_from_vocab(
        {tuple(w): c for w, c in word_freq.items()}, num_merges=25)
    assert got == want


# ---------------------------------------------------------------------------
# apply_bpe / bpe_segment_word
# ---------------------------------------------------------------------------


def test_apply_reproduces_training_segmentation(spark):
    """GPT-2 invariant: greedy lowest-rank application == the symbol
    sequences the trainer ended with, for every training word."""
    wfreq = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    df = _docs(spark, _SENNRICH_DOCS)
    merges = bpe.learn_bpe_merges(df, num_merges=6)
    _, trained_vocab = _naive_learn(wfreq, num_merges=6)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in wfreq:
        assert bpe.bpe_segment_word(w, ranks) == \
            next(s for s in trained_vocab if "".join(s) == w)


def test_apply_bpe_tokens_and_null(spark):
    df = _docs(spark, [("en", "low lowest"), ("en", None)])
    merges = [("l", "o"), ("lo", "w")]
    out = {r["doc_id"]: r["bpe_tokens"]
           for r in bpe.apply_bpe(df, merges).collect()}
    assert out[0] == ["low", "low", "e", "s", "t"]
    assert out[1] is None


def test_apply_bpe_mirrors_java_whitespace_class(spark):
    # \xa0 is Unicode whitespace (Python str.split breaks on it) but NOT
    # in Java's \s — the tokenizer must treat it as a word character,
    # exactly like words_expr does
    df = _docs(spark, [("en", "a\xa0b a")])
    ws_words = (df.select(F.explode(
        bpe.words_expr(F.col("text"))).alias("w")).collect())
    assert sorted(r["w"] for r in ws_words) == ["a", "a\xa0b"]
    out = bpe.apply_bpe(df, [("a", "\xa0")]).collect()[0]["bpe_tokens"]
    assert out == ["a\xa0", "b", "a"]


def test_apply_bpe_no_merges_is_chars(spark):
    df = _docs(spark, [("en", "hi yo")])
    out = bpe.apply_bpe(df, []).collect()[0]["bpe_tokens"]
    assert out == ["h", "i", "y", "o"]
