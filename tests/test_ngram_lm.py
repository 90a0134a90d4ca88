"""operators/ngram_lm: Stupid-Backoff LM, OOV rate, duplicated spans.

Correctness strategy: tiny corpora with hand-computed expected values
(the backoff chain is checked branch by branch: seen trigram, backoff
to bigram, backoff to unigram, unseen-word floor), plus contract edge
cases (short docs, null text, null group keys, within-doc-only repeats)
and a plan guard (no pandas/Python UDF anywhere in the LM path).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from datacanary_spark.operators import ngram_lm as nl


def _docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, lang=lang, text=t)
                                  for i, (lang, t) in enumerate(rows)])


# ---------------------------------------------------------------------------
# ngrams_expr
# ---------------------------------------------------------------------------


def test_ngrams_expr_orders(spark):
    df = spark.createDataFrame([Row(t="a b c d")])
    w = nl.ngrams_expr(F.split("t", " "), 1)
    out = df.select(
        nl.ngrams_expr(F.split("t", " "), 2).alias("g2"),
        nl.ngrams_expr(F.split("t", " "), 3).alias("g3"),
        nl.ngrams_expr(F.split("t", " "), 4).alias("g4"),
        nl.ngrams_expr(F.split("t", " "), 5).alias("g5"),
        w.alias("g1"),
    ).first()
    assert out.g1 == ["a", "b", "c", "d"]
    assert out.g2 == ["a b", "b c", "c d"]
    assert out.g3 == ["a b c", "b c d"]
    assert out.g4 == ["a b c d"]
    assert out.g5 == []  # shorter than k -> empty, not null


def test_ngrams_expr_rejects_bad_k():
    with pytest.raises(ValueError):
        nl.ngrams_expr(F.col("x"), 0)


# ---------------------------------------------------------------------------
# ngram_counts
# ---------------------------------------------------------------------------


def test_ngram_counts_exact_and_pruned(spark):
    df = _docs(spark, [("en", "a b a b c"), ("en", "a b")])
    counts = {(r["order"], r["gram"]): r["c"]
              for r in nl.ngram_counts(df, n=2).collect()}
    assert counts[(0, None)] == 7  # corpus token count (order-0 row)
    assert counts[(1, "a")] == 3
    assert counts[(1, "b")] == 3
    assert counts[(1, "c")] == 1
    assert counts[(2, "a b")] == 3
    assert counts[(2, "b a")] == 1
    assert counts[(2, "b c")] == 1
    pruned = {(r["order"], r["gram"])
              for r in nl.ngram_counts(df, n=2, min_count=2).collect()}
    assert (1, "c") not in pruned and (2, "b c") not in pruned
    assert (2, "a b") in pruned
    assert (0, None) in pruned  # the N row is exempt from min_count


def test_ngram_counts_ignores_null_text(spark):
    df = spark.createDataFrame([Row(doc_id=0, text=None),
                                Row(doc_id=1, text="x y")])
    rows = nl.ngram_counts(df, n=2).collect()
    assert {(r["order"], r["gram"]) for r in rows} == {
        (0, None), (1, "x"), (1, "y"), (2, "x y")}


# ---------------------------------------------------------------------------
# score_stupid_backoff — hand-computed backoff chain
# ---------------------------------------------------------------------------


def test_stupid_backoff_chain_by_hand(spark):
    # training corpus: "a b c" x2 and "a b d" — N = 9 unigrams
    train = _docs(spark, [("en", "a b c"), ("en", "a b c"), ("en", "a b d")])
    counts = nl.ngram_counts(train, n=3)

    # score "a b c": one position, trigram seen: c("a b c")/c("a b") = 2/3
    s = nl.score_stupid_backoff(
        _docs(spark, [("en", "a b c")]), counts, n=3).first()
    assert s.n_scored == 1
    assert s.sb_logscore == pytest.approx(math.log10(2 / 3), abs=1e-12)

    # score "b c d": trigram unseen, bigram "c d" unseen, unigram d seen:
    # 0.4^2 * c(d)/N = 0.16... * (1/9)
    s = nl.score_stupid_backoff(
        _docs(spark, [("en", "b c d")]), counts, n=3).first()
    assert s.sb_logscore == pytest.approx(
        math.log10(0.4 ** 2 * (1 / 9)), abs=1e-12)

    # score "c a b": trigram unseen, bigram "a b" seen: 0.4 * c(a b)/c(a)
    s = nl.score_stupid_backoff(
        _docs(spark, [("en", "c a b")]), counts, n=3).first()
    assert s.sb_logscore == pytest.approx(
        math.log10(0.4 * (3 / 3)), abs=1e-12)

    # unseen word entirely: floor coalesce(c,1)/N with alpha^2
    s = nl.score_stupid_backoff(
        _docs(spark, [("en", "a b zzz")]), counts, n=3).first()
    assert s.sb_logscore == pytest.approx(
        math.log10(0.4 ** 2 * (1 / 9)), abs=1e-12)


def test_stupid_backoff_short_docs_absent(spark):
    train = _docs(spark, [("en", "a b c d")])
    counts = nl.ngram_counts(train, n=3)
    out = nl.score_stupid_backoff(
        _docs(spark, [("en", "a b"), ("en", "a b c")]), counts, n=3)
    assert [r.doc_id for r in out.collect()] == [1]


def test_stupid_backoff_multi_position_mean(spark):
    train = _docs(spark, [("en", "a b c d")])
    counts = nl.ngram_counts(train, n=3)
    s = nl.score_stupid_backoff(
        _docs(spark, [("en", "a b c d")]), counts, n=3).first()
    # both trigrams seen with context count 1 -> score 1.0 each, log10 = 0
    assert s.n_scored == 2
    assert s.sb_logscore == pytest.approx(0.0, abs=1e-12)


def test_stupid_backoff_pruned_context_guard(spark):
    # min_count=2 prunes the bigram "b c" (count 1) but keeps nothing
    # at order 3; a surviving-numerator/pruned-context pair must fall
    # through to the next backoff level instead of dividing by null.
    train = _docs(spark, [("en", "a b c"), ("en", "a b d"), ("en", "a b e")])
    counts = nl.ngram_counts(train, n=3, min_count=2)
    out = nl.score_stupid_backoff(
        _docs(spark, [("en", "a b c")]), counts, n=3)
    row = out.first()
    assert row.sb_logscore is not None
    assert not math.isnan(row.sb_logscore)


def test_stupid_backoff_floor_uses_unpruned_corpus_n(spark):
    # 9 training tokens; min_count=2 prunes everything but a:3, b:3.
    # The unigram floor must divide by the CORPUS token count (9, the
    # order-0 row), not the pruned survivors' sum (6) — Brants f(w)/N;
    # otherwise floor scores inflate as min_count grows.
    train = _docs(spark, [("en", "a b c"), ("en", "a b d"), ("en", "a b e")])
    counts = nl.ngram_counts(train, n=3, min_count=2)
    s = nl.score_stupid_backoff(
        _docs(spark, [("en", "a b zzz")]), counts, n=3).first()
    assert s.sb_logscore == pytest.approx(
        math.log10(0.4 ** 2 * (1 / 9)), abs=1e-12)
    # legacy model table without the order-0 row: documented fallback
    # to the surviving order-1 sum (here 6)
    legacy = counts.where(F.col("order") >= 1)
    s = nl.score_stupid_backoff(
        _docs(spark, [("en", "a b zzz")]), legacy, n=3).first()
    assert s.sb_logscore == pytest.approx(
        math.log10(0.4 ** 2 * (1 / 6)), abs=1e-12)


def test_stupid_backoff_shuffle_join_mode_matches_broadcast(spark):
    train = _docs(spark, [("en", "a b c d e a b c"), ("en", "b c d f")])
    counts = nl.ngram_counts(train, n=3)
    test = _docs(spark, [("en", "a b c d"), ("en", "f f f f")])
    a = {r.doc_id: r.sb_logscore for r in nl.score_stupid_backoff(
        test, counts, n=3, broadcast_model=True).collect()}
    b = {r.doc_id: r.sb_logscore for r in nl.score_stupid_backoff(
        test, counts, n=3, broadcast_model=False).collect()}
    assert a == b


def test_lm_model_table_parquet_roundtrip(spark, tmp_path):
    # the resumability story: train once, persist the model table as
    # parquet, score later runs from the loaded table — scores must be
    # bit-identical to scoring from the in-memory frame (incl. the
    # order-0 corpus-N row surviving the roundtrip)
    train = _docs(spark, [("en", "a b c d e a b c"), ("en", "b c d f")])
    counts = nl.ngram_counts(train, n=3, min_count=2)
    path = str(tmp_path / "lm_model")
    counts.write.parquet(path)
    loaded = spark.read.parquet(path)
    test = _docs(spark, [("en", "a b c d"), ("en", "f f f f")])
    a = {r.doc_id: r.sb_logscore
         for r in nl.score_stupid_backoff(test, counts, n=3).collect()}
    b = {r.doc_id: r.sb_logscore
         for r in nl.score_stupid_backoff(test, loaded, n=3).collect()}
    assert a == b


def test_lm_path_has_no_python_udf(spark):
    train = _docs(spark, [("en", "a b c d")])
    counts = nl.ngram_counts(train, n=3)
    plan = nl.score_stupid_backoff(
        _docs(spark, [("en", "a b c d")]), counts, n=3) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan  # no BatchEvalPython / ArrowEvalPython


# ---------------------------------------------------------------------------
# oov_stats
# ---------------------------------------------------------------------------


def test_oov_rate_threshold_and_null_group(spark):
    rows = ([("en", "cat dog")] * 3          # cat/dog count 3 -> in vocab
            + [("en", "cat dog rare")]       # rare count 1 -> OOV
            + [(None, "x x x x x")])         # null lang is its own group
    out = {r["lang"]: r for r in nl.oov_stats(
        _docs(spark, rows), min_count=3).collect()}
    en = out["en"]
    assert en["n_docs"] == 4
    # three docs 0.0, one doc 1/3
    assert en["mean_oov_frac"] == pytest.approx((1 / 3) / 4, abs=1e-12)
    nul = out[None]
    assert nul["n_docs"] == 1 and nul["mean_oov_frac"] == 0.0


def test_oov_vocab_is_per_group(spark):
    # "bonjour" is frequent in fr but absent from en's vocabulary
    rows = [("fr", "bonjour bonjour bonjour"), ("en", "bonjour hello hello")]
    out = {r["lang"]: r["mean_oov_frac"] for r in nl.oov_stats(
        _docs(spark, rows), min_count=2).collect()}
    assert out["fr"] == 0.0
    assert out["en"] == pytest.approx(1 / 3, abs=1e-12)


# ---------------------------------------------------------------------------
# duplicate_span_stats
# ---------------------------------------------------------------------------


def test_duplicate_spans_cross_doc_only(spark):
    shared = "one two three four five"
    rows = [
        ("en", shared + " alpha"),          # shares the 5-gram with doc 1
        ("en", shared + " beta"),
        ("en", "p q r s t u"),              # unique
        ("en", "z y x w v z y x w v"),      # repeats WITHIN one doc only
    ]
    out = nl.duplicate_span_stats(_docs(spark, rows), k=5).first()
    assert out["n_docs"] == 4
    assert out["docs_with_dup"] == 2  # within-doc repeat is NOT cross-doc
    # docs 0/1: 2 spans each, 1 duplicated -> 0.5; docs 2/3: 0.0
    assert out["mean_dup_frac"] == pytest.approx((0.5 + 0.5) / 4, abs=1e-12)


def test_duplicate_spans_short_docs_excluded(spark):
    rows = [("en", "a b c"), ("en", "a b c d e")]
    out = nl.duplicate_span_stats(_docs(spark, rows), k=5).first()
    assert out["n_docs"] == 1 and out["docs_with_dup"] == 0


def test_ngram_counts_is_single_pass(spark):
    """r06 optimization pin: the model build tags gram orders doc-side
    (one explode + one (order, gram) aggregation), and the order-0
    total row's branch physically REUSES that aggregation's exchange —
    so the corpus is tokenized and exploded exactly once. The old
    shape (one explode+aggregate per order plus a separate narrow
    total aggregate) had nothing to reuse."""
    train = _docs(spark, [("en", "a b c d e"), ("en", "a b c")])
    out = nl.ngram_counts(train, n=3)
    out.collect()  # AQE: reuse is visible in the executed plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan
    spark.catalog.clearCache()


def test_score_materializes_model_once(spark):
    """r06 optimization pin: the 2n model-table references in scoring
    resolve against ONE persisted materialization (InMemoryRelation),
    not 2n re-derivations of the count aggregation from the corpus."""
    train = _docs(spark, [("en", "a b c d e")])
    counts = nl.ngram_counts(train, n=3)
    plan = nl.score_stupid_backoff(
        _docs(spark, [("en", "a b c d")]), counts, n=3) \
        ._jdf.queryExecution().optimizedPlan().toString()
    assert "InMemoryRelation" in plan
    spark.catalog.clearCache()  # don't leak the model cache to later tests
