"""Script-mix signals (operators/text_analysis.py)."""

from __future__ import annotations


def test_with_script_mix_fractions_and_flag(spark):
    from datacanary_spark.operators.text_analysis import with_script_mix

    rows = [
        (1, "hello world"),                      # pure latin
        (2, "hello мир world"),   # latin + cyrillic mix
        (3, "мир и труд"),  # pure cyrillic
        (4, "12345 !!!"),                        # no letters
        (5, None),                               # null text
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in with_script_mix(
        df, scripts=["latin", "cyrillic"]).collect()}
    assert out[1]["latin_frac"] == 1.0 and out[1]["mixed_script"] is False
    assert out[2]["mixed_script"] is True
    assert out[2]["cyrillic_chars"] == 3
    assert out[3]["latin_chars"] == 0 and out[3]["mixed_script"] is False
    assert out[4]["letter_chars"] == 0
    assert out[4]["mixed_script"] is None   # no letters -> unknown
    assert out[5]["letter_chars"] is None and out[5]["mixed_script"] is None
    import pytest as _pt
    with _pt.raises(ValueError, match="unknown scripts"):
        with_script_mix(df, scripts=["latin", "klingon"])


def test_with_script_mix_stays_in_codegen(spark):
    from datacanary_spark.operators.text_analysis import with_script_mix

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    plan = with_script_mix(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan
