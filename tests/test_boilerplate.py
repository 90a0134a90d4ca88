"""operators/boilerplate: host-scoped template-line detection/removal."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from datacanary_spark.operators import boilerplate as bp


def _df(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, host=h, text=t) for i, (h, t) in enumerate(rows)])


FOOTER = "(c) example.com - all rights reserved"


def test_detects_host_scoped_template_lines(spark):
    rows = [
        ("a", f"unique one\n{FOOTER}"),
        ("a", f"unique two\n{FOOTER}"),
        ("a", f"unique three\n{FOOTER}"),
        ("b", f"other site\n{FOOTER}"),   # 1/1 docs on b -> below min_docs
    ]
    out = bp.boilerplate_lines(_df(spark, rows), min_docs=2, min_frac=0.5) \
        .collect()
    assert len(out) == 1
    r = out[0]
    assert (r["host"], r["ln"], r["n_docs_with_line"], r["host_docs"]) == \
        ("a", FOOTER, 3, 3)
    assert r["frac"] == pytest.approx(1.0)


def test_min_frac_alone_rejects_a_frequent_line(spark):
    # footer in 2 of 5 host docs: nd=2 passes min_docs=2, but
    # frac=0.4 < min_frac=0.5 — the FRACTION test must be the one that
    # rejects it (a regression dropping the frac predicate would keep it)
    rows = [
        ("a", f"one\n{FOOTER}"),
        ("a", f"two\n{FOOTER}"),
        ("a", "three"),
        ("a", "four"),
        ("a", "five"),
    ]
    df = _df(spark, rows)
    assert bp.boilerplate_lines(df, min_docs=2, min_frac=0.5).count() == 0
    # same corpus, threshold at the boundary: 2/5 = 0.4 qualifies
    kept = bp.boilerplate_lines(df, min_docs=2, min_frac=0.4).collect()
    assert [(r["ln"], r["n_docs_with_line"]) for r in kept] == [(FOOTER, 2)]


def test_strip_accepts_precomputed_templates(spark):
    rows = [("a", f"first\n{FOOTER}"), ("a", f"{FOOTER}\nsecond"),
            ("b", "keep me")]
    df = _df(spark, rows)
    tpl = bp.boilerplate_lines(df, min_docs=2, min_frac=0.5)
    a = {r["doc_id"]: r["text"]
         for r in bp.strip_boilerplate(df, templates=tpl).collect()}
    b = {r["doc_id"]: r["text"]
         for r in bp.strip_boilerplate(df, min_docs=2, min_frac=0.5).collect()}
    assert a == b == {0: "first", 1: "second", 2: "keep me"}


def test_frequency_counts_docs_not_occurrences(spark):
    # one doc repeating the line 5x must not cross min_docs=2
    rows = [("a", "\n".join([FOOTER] * 5)), ("a", "plain content")]
    assert bp.boilerplate_lines(_df(spark, rows), min_docs=2,
                                min_frac=0.5).count() == 0


def test_trimmed_matching_and_blank_lines_exempt(spark):
    rows = [("a", f"  {FOOTER}  \n\ncontent x"),
            ("a", f"{FOOTER}\n\ncontent y")]
    out = bp.boilerplate_lines(_df(spark, rows), min_docs=2, min_frac=0.5) \
        .collect()
    # the footer matches across docs despite padding; blank lines never do
    assert [r["ln"] for r in out] == [FOOTER]


def test_strip_preserves_order_and_untouched_docs(spark):
    rows = [
        ("a", f"first\n{FOOTER}\nsecond"),
        ("a", f"{FOOTER}\nalpha\nbeta"),
        ("b", "no template here"),
    ]
    out = {r["doc_id"]: r["text"] for r in bp.strip_boilerplate(
        _df(spark, rows), min_docs=2, min_frac=0.5).collect()}
    assert out[0] == "first\nsecond"
    assert out[1] == "alpha\nbeta"
    assert out[2] == "no template here"


def test_strip_fully_templated_doc_becomes_empty(spark):
    rows = [("a", FOOTER), ("a", FOOTER), ("a", f"{FOOTER}\nreal content")]
    out = {r["doc_id"]: r["text"] for r in bp.strip_boilerplate(
        _df(spark, rows), min_docs=2, min_frac=0.5).collect()}
    assert out[0] == "" and out[1] == ""
    assert out[2] == "real content"


def test_strip_null_text_and_null_host_pass_through(spark):
    df = spark.createDataFrame([
        Row(doc_id=0, host=None, text=f"x\n{FOOTER}"),
        Row(doc_id=1, host=None, text=f"y\n{FOOTER}"),
        Row(doc_id=2, host="a", text=None),
    ])
    out = {r["doc_id"]: r["text"] for r in bp.strip_boilerplate(
        df, min_docs=2, min_frac=0.5).collect()}
    # null host is a real group: its shared footer is template
    assert out[0] == "x" and out[1] == "y"
    assert out[2] is None


def test_strip_shuffle_join_mode_matches_broadcast(spark):
    rows = [("a", f"first\n{FOOTER}"), ("a", f"{FOOTER}\nsecond"),
            ("b", "keep me")]
    a = {r["doc_id"]: r["text"] for r in bp.strip_boilerplate(
        _df(spark, rows), broadcast_table=True).collect()}
    b = {r["doc_id"]: r["text"] for r in bp.strip_boilerplate(
        _df(spark, rows), broadcast_table=False).collect()}
    assert a == b
