"""C4 line-quality cleaning (text_analysis.c4_clean): line retention
rule, whole-doc drops, null passthrough, empty-doc removal."""

from __future__ import annotations

from pyspark.sql import functions as F

from datacanary_spark.operators import text_analysis as ta

GOOD = "This is a real sentence with several words."
MENU = "MENU"
JS = "Please enable JavaScript to continue viewing."
NOPUNCT = "click here for more"


def _df(spark):
    return spark.createDataFrame(
        [
            (1, "\n".join([GOOD, MENU, JS, NOPUNCT])),
            (2, "\n".join([MENU, NOPUNCT])),               # all junk
            (3, GOOD + "\nAnd here is more lorem ipsum filler."),
            (4, GOOD + "\nfunction f() { return 1; }"),
            (5, None),
            (6, 'He said "stop"'),                          # quote terminal
        ],
        "doc_id long, text string")


def test_line_rule_keeps_only_content_lines(spark):
    out = {r["doc_id"]: r["text"] for r in ta.c4_clean(_df(spark)).collect()}
    assert out[1] == GOOD                       # 3 junk lines removed
    assert 2 not in out                         # all lines junk → dropped
    assert 3 not in out                         # lorem ipsum → doc dropped
    assert 4 not in out                         # brace → doc dropped
    assert out[5] is None                       # null passes through
    assert out[6] == 'He said "stop"'           # " counts as terminal


def test_c4_clean_knobs(spark):
    df = _df(spark)
    # no terminal requirement: the call-to-action line survives
    out = {r["doc_id"]: r["text"]
           for r in ta.c4_clean(df, require_terminal=False).collect()}
    assert NOPUNCT in out[1] and MENU not in out[1]
    # keep empty docs when asked
    kept = ta.c4_clean(df, drop_empty=False)
    assert {r["doc_id"] for r in kept.collect()} == {1, 2, 5, 6}
    assert kept.where("doc_id = 2").collect()[0]["text"] == ""
    # doc-level knobs off: brace/lorem docs survive line cleaning
    out2 = {r["doc_id"] for r in ta.c4_clean(
        df, drop_brace=False, ban_phrases=()).collect()}
    assert {3, 4} <= out2


def test_c4_clean_plan_is_narrow(spark):
    plan = ta.c4_clean(_df(spark))._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan  # pure per-row filter+project
