"""operators/text_analysis.rule_ablation: per-rule keep-rate ablation."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from datacanary_spark.functions.heuristics import FilterConfig
from datacanary_spark.operators.text_analysis import rule_ablation


def _good_text(n=60):
    # passes every heuristic rule: n words (50..1000), ~50% stopwords,
    # mean word length in range, no symbols, all lines/trigrams distinct
    return " ".join(f"the word{i}" for i in range(n // 2))


def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, lang=lang, text=t) for i, (lang, t) in enumerate(rows)])


def test_ablation_invariants_and_unique_blocking(spark):
    df = _docs(spark, [
        ("en", _good_text()),          # passes all rules
        ("en", _good_text()),          # passes all rules
        ("en", "tiny"),                # too_few_words + stopword_fraction
        ("en", "the " * 30),           # too_few_words ONLY (30 words < 50;
                                       #   all-stopword, dup trigrams = "the
                                       #   the the" -> dup_trigrams also...
    ])
    out = rule_ablation(df).collect()
    rows = {r.rule: r for r in out}
    assert len(rows) == len(FilterConfig().heuristic_rule_names)
    for r in rows.values():
        assert r.n_docs == 4
        assert r.kept_all == 2                      # same for every rule
        assert r.blocked >= r.uniquely_blocked >= 0
        assert r.keep_rate_without == pytest.approx(
            (r.kept_all + r.uniquely_blocked) / r.n_docs)
    # "tiny" violates >1 rule, so nothing is uniquely blocked by
    # too_few_words unless the fourth doc violates only it — it does not
    # (dup_trigrams fires too), so unique counts for these rules are 0
    assert rows["too_few_words"].blocked == 2
    assert rows["too_few_words"].uniquely_blocked == 0


def test_ablation_uniquely_blocked_recovers_doc(spark):
    # a doc violating EXACTLY one rule: good text but 40 words (< 50),
    # everything else in range -> dropping too_few_words recovers it
    df = _docs(spark, [
        ("en", _good_text(60)),
        ("en", _good_text(40)),
    ])
    rows = {r.rule: r for r in rule_ablation(df).collect()}
    assert rows["too_few_words"].kept_all == 1
    assert rows["too_few_words"].blocked == 1
    assert rows["too_few_words"].uniquely_blocked == 1
    assert rows["too_few_words"].keep_rate_without == pytest.approx(1.0)
    for name, r in rows.items():
        if name != "too_few_words":
            assert r.blocked == 0 and r.uniquely_blocked == 0
            assert r.keep_rate_without == pytest.approx(0.5)


def test_ablation_null_text_and_null_group(spark):
    # null text -> every stat null -> every rule hits (containment
    # contract); null lang is still a group
    df = spark.createDataFrame(
        [Row(doc_id=0, lang=None, text=None),
         Row(doc_id=1, lang=None, text=_good_text())],
        schema="doc_id long, lang string, text string")
    rows = {r.rule: r for r in rule_ablation(df).collect()}
    for r in rows.values():
        assert r[0] is None                      # null lang is a group
        assert r.n_docs == 2 and r.kept_all == 1
        assert r.uniquely_blocked == 0           # >1 rule hits, none uniquely
    # word-count/length/ratio stats are NULL for null text -> those
    # rules hit (containment); the dup/bullet/ellipsis line stats
    # coalesce to 0.0 (same as the SQL twin) so those rules pass
    assert rows["too_few_words"].blocked == 1
    assert rows["mean_word_length"].blocked == 1
    assert rows["stopword_fraction"].blocked == 1
    assert rows["dup_lines"].blocked == 0
