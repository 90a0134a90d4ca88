"""operators/text_analysis.char_entropy_expr + control_char_frac_expr
and operators/corpus_stats.zipf_slope.

Correctness strategy: hand-computed closed-form values (uniform and
skewed char distributions; an exact-Zipf corpus whose slope is -1 by
construction), edge cases (empty/null text, single-type groups, null
group keys, tie-breaking, rank caps), and a plan guard (the entropy
fold must stay a zero-shuffle doc-side expression).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from datacanary_spark.operators import corpus_stats as cs
from datacanary_spark.operators import text_analysis as ta


def _ent(spark, text):
    return spark.createDataFrame([Row(t=text)]).select(
        ta.char_entropy_expr(F.col("t")).alias("e")).first().e


def test_char_entropy_hand_computed(spark):
    # uniform over 4 chars -> exactly 2 bits
    assert _ent(spark, "abcd") == pytest.approx(2.0, abs=1e-12)
    # single repeated char -> 0 bits
    assert _ent(spark, "aaaa") == pytest.approx(0.0, abs=1e-12)
    # p = (2/3, 1/3): H = ln3/ln2 - (2/3)  (= 0.91829583...)
    expect = (math.log(3) - (2 * math.log(2)) / 3) / math.log(2)
    assert _ent(spark, "aab") == pytest.approx(expect, abs=1e-12)


def test_char_entropy_empty_and_null(spark):
    df = spark.createDataFrame([Row(i=0, t=""), Row(i=1, t=None)])
    out = {r.i: r.e for r in df.select(
        "i", ta.char_entropy_expr(F.col("t")).alias("e")).collect()}
    assert out[0] is None and out[1] is None


def test_char_entropy_is_shuffle_free(spark):
    df = spark.createDataFrame([Row(t="some text")])
    plan = df.select(ta.char_entropy_expr(F.col("t")).alias("e")) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


def test_control_char_frac(spark):
    df = spark.createDataFrame([
        Row(i=0, t="ab\x07c"),        # 1 control of 4 chars
        Row(i=1, t="clean text"),
        Row(i=2, t=""),               # empty -> NULL, not divide-by-zero
        Row(i=3, t="\t\n ok"),        # tab/newline are NOT damage
    ])
    out = {r.i: r.f for r in df.select(
        "i", ta.control_char_frac_expr(F.col("t")).alias("f")).collect()}
    assert out[0] == pytest.approx(0.25)
    assert out[1] == 0.0
    assert out[2] is None
    assert out[3] == 0.0


def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, lang=lang, text=t) for i, (lang, t) in enumerate(rows)])


def test_zipf_slope_exact_zipf_corpus(spark):
    # counts 6, 3, 2 = 6/rank exactly -> slope is -1 in closed form
    df = _docs(spark, [("en", "a a a a a a b b b c c")])
    row = cs.zipf_slope(df, min_count=2).first()
    assert row.n_types == 3
    assert row.zipf_slope == pytest.approx(-1.0, abs=1e-12)


def test_zipf_slope_single_type_is_null(spark):
    # one ranked type: x = ln(1) = 0 for every point -> denominator 0
    df = _docs(spark, [("en", "a a a")])
    row = cs.zipf_slope(df, min_count=2).first()
    assert row.n_types == 1 and row.zipf_slope is None


def test_zipf_slope_min_count_and_max_rank(spark):
    df = _docs(spark, [("en", "a a a a b b c")])   # c below min_count=2
    row = cs.zipf_slope(df, min_count=2).first()
    assert row.n_types == 2
    # max_rank=1 keeps only the top type -> single point -> NULL slope
    row = cs.zipf_slope(df, min_count=2, max_rank=1).first()
    assert row.n_types == 1 and row.zipf_slope is None


def test_zipf_slope_null_group_and_ties(spark):
    # ties (b and c both count 2) rank deterministically by token asc;
    # the null-lang group is still a group
    df = _docs(spark, [("en", "a a a b b c c"), (None, "x x y y")])
    rows = {r[0]: r for r in cs.zipf_slope(df, min_count=2).collect()}
    assert rows["en"].n_types == 3
    assert rows[None].n_types == 2
    # null group: counts (2, 2) -> y constant -> slope exactly 0
    assert rows[None].zipf_slope == pytest.approx(0.0, abs=1e-12)


def test_zipf_slope_validates_params(spark):
    df = _docs(spark, [("en", "a")])
    with pytest.raises(ValueError):
        cs.zipf_slope(df, min_count=0)
    with pytest.raises(ValueError):
        cs.zipf_slope(df, max_rank=0)
