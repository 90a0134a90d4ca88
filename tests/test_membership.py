"""Bloom-filter membership (operators/membership.py): geometry, no
false negatives, literal==udf dispatch equivalence, and exact
equality of decontaminate_bloom with the plain anti-join."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from datacanary_spark.operators import dedup as dd
from datacanary_spark.operators import membership as mb


def test_bloom_geometry_standard_sizing():
    m, k = mb.bloom_geometry(1000, 0.01)
    # canonical: ~9.585 bits/item, k ~ 7
    assert 9536 <= m <= 9664 and m % 64 == 0
    assert k == 7
    # degenerate inputs stay usable
    assert mb.bloom_geometry(0, 0.01) == (64, 1)
    with pytest.raises(ValueError):
        mb.bloom_geometry(100, 1.5)


def test_build_bloom_no_false_negatives_and_fpp(spark):
    keys = [(f"key-{i}",) for i in range(500)]
    ref = spark.createDataFrame(keys + [(None,)], "k string")
    m, k = mb.bloom_geometry(500, 0.01)
    spec = mb.build_bloom(ref, "k", m, k)
    assert 0 < spec.n_set_bits <= 500 * k

    # every inserted key MUST test positive (bloom contract)
    hits = (ref.where(F.col("k").isNotNull())
            .select(mb.might_contain_expr(F.col("k"), spec).alias("h")))
    assert all(r["h"] for r in hits.collect())

    # absent keys: false-positive rate near fpp, never catastrophic
    absent = spark.range(2000).select(
        F.concat(F.lit("other-"), F.col("id")).alias("k"))
    fp = absent.select(mb.might_contain_expr(F.col("k"), spec).alias("h")) \
        .where("h").count()
    assert fp / 2000 < 0.05

    # NULL key tests NULL (three-valued), not True/False
    nulls = spark.sql("SELECT CAST(NULL AS STRING) AS k").select(
        mb.might_contain_expr(F.col("k"), spec).alias("h")).collect()
    assert nulls[0]["h"] is None


def test_literal_and_udf_dispatch_agree(spark):
    ref = spark.range(300).select(F.md5(F.col("id").cast("string")).alias("k"))
    m, k = mb.bloom_geometry(300, 0.001)
    spec = mb.build_bloom(ref, "k", m, k)
    probe = spark.range(1000).select(
        F.md5((F.col("id") * 3).cast("string")).alias("k"))
    lit = probe.select("k", mb.might_contain_expr(
        F.col("k"), spec, mode="literal").alias("h")).collect()
    udf = probe.select("k", mb.might_contain_expr(
        F.col("k"), spec, mode="udf").alias("h")).collect()
    assert sorted(map(tuple, lit)) == sorted(map(tuple, udf))
    with pytest.raises(ValueError):
        mb.might_contain_expr(F.col("k"), spec, mode="nope")


def test_auto_dispatch_threshold():
    small = mb.BloomSpec(64 * mb.LITERAL_WORDS_BUDGET, 3,
                         np.zeros(mb.LITERAL_WORDS_BUDGET, dtype=np.int64))
    big = mb.BloomSpec(64 * (mb.LITERAL_WORDS_BUDGET + 1), 3,
                       np.zeros(mb.LITERAL_WORDS_BUDGET + 1, dtype=np.int64))
    assert mb._resolve_mode("auto", small.words.size) == "literal"
    assert mb._resolve_mode("auto", big.words.size) == "udf"


def test_decontaminate_bloom_equals_plain_anti_join(spark):
    # corpus with planted overlap, whitespace-variant duplicates of the
    # reference (normalization must catch them), and null text
    corpus = spark.createDataFrame(
        [(i, f"document body number {i % 40}") for i in range(200)]
        + [(900, "  Document   BODY number 7 "),  # normalizes onto %40==7
           (901, None)],
        "doc_id long, text string")
    reference = spark.createDataFrame(
        [(f"document body number {i}",) for i in (7, 11, 13)]
        + [(None,)], "text string")

    plain = dd.decontaminate(corpus, reference, mode="exact")
    for mode in ("literal", "udf"):
        got = mb.decontaminate_bloom(corpus, reference, mode=mode)
        assert sorted(r["doc_id"] for r in got.collect()) \
            == sorted(r["doc_id"] for r in plain.collect())

    # null-text doc always survives; matching docs are gone
    ids = {r["doc_id"] for r in
           mb.decontaminate_bloom(corpus, reference).collect()}
    assert 901 in ids and 900 not in ids
    assert not any(i % 40 in (7, 11, 13) for i in ids if i < 200)


def test_decontaminate_bloom_expected_items_skips_count(spark):
    corpus = spark.createDataFrame(
        [(i, f"t {i % 10}") for i in range(50)], "doc_id long, text string")
    reference = spark.createDataFrame([("t 3",)], "text string")
    got = mb.decontaminate_bloom(corpus, reference, expected_items=64)
    assert got.count() == 45


def test_decontaminate_bloom_persist_modes_agree(spark):
    from datacanary_spark.plans.caching import CacheScope

    corpus = spark.createDataFrame(
        [(i, f"body {i % 20}") for i in range(100)],
        "doc_id long, text string")
    reference = spark.createDataFrame([("body 3",), ("body 5",)],
                                      "text string")
    base = sorted(r["doc_id"] for r in
                  mb.decontaminate_bloom(corpus, reference).collect())
    with CacheScope() as scope:
        scoped = sorted(r["doc_id"] for r in mb.decontaminate_bloom(
            corpus, reference, persist=scope).collect())
    plain = sorted(r["doc_id"] for r in mb.decontaminate_bloom(
        corpus, reference, persist=True).collect())
    spark.catalog.clearCache()
    assert base == scoped == plain
