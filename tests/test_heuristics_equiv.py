"""The staged (with_text_stats) and inline (text_stat_exprs) stat paths
must be bit-identical — the staged one exists purely for performance
(arrays bound once per row instead of re-inlined per consumer)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datacanary_spark.functions.heuristics import (
    STAT_NAMES,
    stat_cols,
    text_stat_exprs,
    with_text_stats,
)
from datacanary_spark.sources.fixtures import pages_spark_df

EDGE_TEXTS = [
    (0, None),
    (1, ""),
    (2, "one"),
    (3, "a b"),
    (4, "exactly three words"),
    (5, "  leading   and   trailing  "),
    (6, "- bullet\n- bullet\n- bullet\nplain"),
    (7, "dup line\ndup line\ndup line\nother..."),
    (8, "w1 w2 w3 w1 w2 w3 w1 w2 w3 w1 w2 w3"),
]


def _collect(df, cols):
    return [tuple(r[c] for c in cols) for r in
            df.orderBy("doc_id").select("doc_id", *cols).collect()]


def test_staged_equals_inline_on_edges(spark):
    df = spark.createDataFrame(EDGE_TEXTS, "doc_id: long, text: string")
    inline = df.select(
        "doc_id", *[v.alias(k) for k, v in text_stat_exprs("text").items()])
    staged = with_text_stats(df, "text", prefix="")
    cols = list(STAT_NAMES)
    assert _collect(inline, cols) == _collect(staged, cols)


def test_staged_equals_inline_on_corpus(spark):
    df = pages_spark_df(spark, 120).select(
        F.xxhash64("url").alias("doc_id"), "text")
    inline = df.select(
        "doc_id", *[v.alias(k) for k, v in text_stat_exprs("text").items()])
    staged = with_text_stats(df, "text", prefix="")
    cols = list(STAT_NAMES)
    assert _collect(inline, cols) == _collect(staged, cols)


def test_stat_cols_refs(spark):
    df = with_text_stats(
        spark.createDataFrame(EDGE_TEXTS, "doc_id: long, text: string"),
        "text", prefix="stat_")
    refs = stat_cols("stat_")
    out = df.select(*[refs[n].alias(n) for n in STAT_NAMES])
    assert out.columns == list(STAT_NAMES)
    assert out.count() == len(EDGE_TEXTS)
