"""Exhaustive n-gram decontamination (operators/dedup.py:
ngram_overlap_stats / decontaminate_ngrams).

Fixture geometry: a tiny corpus with a planted reference quote so the
per-doc overlap fractions are hand-computable, plus the exemption rows
(NULL text, shorter than k tokens).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from datacanary_spark.operators import dedup as dd

REF_SENT = "the quick brown fox jumps over the lazy dog tonight"


def _corpus(spark):
    rows = [
        # 0: identical to the reference sentence -> overlap 1.0
        Row(doc_id=0, text=REF_SENT),
        # 1: quotes the reference inside novel text
        Row(doc_id=1, text="breaking news today " + REF_SENT +
            " said a witness on the scene yesterday evening"),
        # 2: completely novel
        Row(doc_id=2, text="alpha beta gamma delta epsilon zeta eta "
                           "theta iota kappa"),
        # 3: too short for a 5-gram (4 tokens) -> absent from stats
        Row(doc_id=3, text="only four tokens here"[:21]),
        # 4: NULL text -> absent from stats
        Row(doc_id=4, text=None),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def _reference(spark):
    return spark.createDataFrame([Row(text=REF_SENT)], "text string")


def test_overlap_stats_fractions(spark):
    stats = {r.doc_id: r for r in dd.ngram_overlap_stats(
        _corpus(spark), _reference(spark), k=5).collect()}
    # doc 0: 10 tokens -> 6 grams, all in the reference
    assert stats[0].n_grams == 6
    assert stats[0].n_contaminated == 6
    assert stats[0].overlap_frac == pytest.approx(1.0)
    # doc 1: 21 tokens -> 17 grams; the quoted sentence contributes its
    # 6 grams intact (the surrounding words break every straddling gram)
    assert stats[1].n_grams == 17
    assert stats[1].n_contaminated == 6
    assert stats[1].overlap_frac == pytest.approx(6 / 17)
    # doc 2: 10 tokens -> 6 grams, none contaminated
    assert stats[2].n_grams == 6
    assert stats[2].n_contaminated == 0
    assert stats[2].overlap_frac == 0.0
    # docs 3 (short) and 4 (NULL) have no positions: absent
    assert 3 not in stats and 4 not in stats


def test_decontaminate_default_threshold_drops_any_overlap(spark):
    surv = dd.decontaminate_ngrams(
        _corpus(spark), _reference(spark), k=5)
    ids = sorted(r.doc_id for r in surv.select("doc_id").collect())
    # any shared 5-gram contaminates (GPT-3 rule): docs 0 and 1 drop;
    # the exempt rows (short, NULL) always survive
    assert ids == [2, 3, 4]


def test_decontaminate_fraction_threshold(spark):
    surv = dd.decontaminate_ngrams(
        _corpus(spark), _reference(spark), k=5, max_overlap_frac=0.5)
    ids = sorted(r.doc_id for r in surv.select("doc_id").collect())
    # doc 1's fraction is 6/17 = 0.353 <= 0.5 -> survives; doc 0 (1.0) drops
    assert ids == [1, 2, 3, 4]


def test_schema_unchanged_and_shuffle_mode_parity(spark):
    corpus = _corpus(spark).withColumn("lang", F.lit("en"))
    surv_b = dd.decontaminate_ngrams(corpus, _reference(spark), k=5)
    assert surv_b.columns == corpus.columns
    surv_s = dd.decontaminate_ngrams(corpus, _reference(spark), k=5,
                                     broadcast_ref=False)
    assert sorted(r.doc_id for r in surv_b.collect()) == \
        sorted(r.doc_id for r in surv_s.collect())


def test_entry_query_survivors_match_operator(spark):
    """The entry query's survivor accounting (threshold on the stats
    frame) must equal decontaminate_ngrams' survivor set."""
    sf = "/root/testdata/sf0.001"
    d = spark.read.parquet(f"{sf}/documents.parquet") \
        .select("doc_id", "lang", "text")
    ref = d.where(F.col("doc_id") % 7 == 0).select("text")
    surv = dd.decontaminate_ngrams(d, ref, k=5, max_overlap_frac=0.2)
    got = {(r.lang,): (r.n, r.s) for r in
           surv.groupBy("lang").agg(
               F.count(F.lit(1)).alias("n"),
               F.sum("doc_id").cast("long").alias("s")).collect()}
    from datacanary_spark.entry_queries import QUERIES

    rolled = {(r.lang,): (r.n_survivors, r.sum_survivor_ids) for r in
              QUERIES["ngram_decontam_by_lang"](spark, sf).collect()}
    assert got == rolled


def test_reference_probe_is_broadcast(spark):
    plan = dd.ngram_overlap_stats(
        _corpus(spark), _reference(spark), k=5) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
