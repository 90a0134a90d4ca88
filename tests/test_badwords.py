"""Bad-words lexicon filter (text_analysis.with_badword_stats /
filter_badwords): token law, C4 strict + fraction rules, null/empty
exemption, expr==join dispatch parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datacanary_spark.operators import text_analysis as ta

LEX = ["gorram", "frak", "smeg"]


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "a clean doc with several plain words here"),
            (2, "one gorram hit inside an otherwise long clean doc"),
            # high density: 3 hits / 5 tokens
            (3, "gorram frak smeg spam spam"),
            # case, punctuation-adjacency, repeats all count
            (4, "Gorram! gorram,frak"),
            # substring must NOT match (token law, not contains)
            (5, "smegma gorrams antifrak"),
            (6, None),                       # null text → 0 tokens
            (7, ""),                         # empty
            (8, "只有中文没有字母"),            # no [a-z] tokens at all
        ],
        "doc_id long, text string")


def _stats(df):
    return {r.doc_id: (r.badword_hits, r.badword_words,
                       round(r.badword_fraction, 9))
            for r in df.collect()}


def test_badword_stats_expr_token_law(spark):
    got = _stats(ta.with_badword_stats(_docs(spark), LEX, mode="expr"))
    assert got[1] == (0, 8, 0.0)
    assert got[2] == (1, 9, round(1 / 9, 9))
    assert got[3] == (3, 5, 0.6)
    # "Gorram! gorram,frak" → tokens [gorram, gorram, frak]
    assert got[4] == (3, 3, 1.0)
    # substrings are not hits
    assert got[5] == (0, 3, 0.0)
    for null_ish in (6, 7, 8):
        assert got[null_ish] == (0, 0, 0.0)


def test_badword_join_mode_matches_expr(spark):
    d = _docs(spark)
    expr = _stats(ta.with_badword_stats(d, LEX, mode="expr"))
    join = _stats(ta.with_badword_stats(d, LEX, mode="join"))
    assert expr == join
    # DataFrame lexicon input takes the join path too
    lex_df = spark.createDataFrame([(w,) for w in LEX], "word string")
    assert _stats(ta.with_badword_stats(d, lex_df, mode="join")) == expr


def test_filter_badwords_strict_and_fraction(spark):
    d = _docs(spark)
    # C4 strict: any hit drops
    strict = sorted(r.doc_id for r in
                    ta.filter_badwords(d, LEX).select("doc_id").collect())
    assert strict == [1, 5, 6, 7, 8]
    # density rule: one hit in a long doc survives, spam does not
    soft = sorted(r.doc_id for r in
                  ta.filter_badwords(d, LEX, max_hits=None,
                                     max_fraction=0.2)
                    .select("doc_id").collect())
    assert soft == [1, 2, 5, 6, 7, 8]
    # stats columns drop by default, stay with keep_stats
    assert "badword_hits" not in ta.filter_badwords(d, LEX).columns
    kept = ta.filter_badwords(d, LEX, keep_stats=True)
    assert {"badword_hits", "badword_words",
            "badword_fraction"} <= set(kept.columns)


def test_filter_badwords_validation(spark):
    d = _docs(spark)
    with pytest.raises(ValueError, match="max_hits"):
        ta.filter_badwords(d, LEX, max_hits=None, max_fraction=None)
    with pytest.raises(ValueError, match="unknown mode"):
        ta.with_badword_stats(d, LEX, mode="bogus")
    with pytest.raises(ValueError, match="in-memory"):
        ta.with_badword_stats(
            d, spark.createDataFrame([("x",)], "word string"), mode="expr")


def test_empty_lexicon_never_hits(spark):
    got = _stats(ta.with_badword_stats(_docs(spark), [], mode="expr"))
    assert all(h == 0 for h, _, _ in got.values())


def test_badword_expr_plan_stays_whole_stage(spark):
    """expr mode must pipeline with the scan: no exchange, no Python."""
    df = ta.with_badword_stats(_docs(spark), LEX, mode="expr")
    s = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in s
    assert "Python" not in s
