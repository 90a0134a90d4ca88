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


def test_chunk_documents_semantics(spark):
    from datacanary_spark.operators.text_analysis import chunk_documents

    rows = [(1, "abcdefghij"),   # 10 chars
            (2, "abc"),          # shorter than one chunk
            (3, ""),             # empty -> one empty chunk
            (4, None)]           # null -> no rows
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(df, chunk_chars=4, stride=3)
    got = sorted((r["doc_id"], r["chunk_ix"], r["chunk"])
                 for r in out.collect())
    # doc 1: ceil((10-4)/3)+1 = 3 chunks at offsets 0,3,6
    assert got == [(1, 0, "abcd"), (1, 1, "defg"), (1, 2, "ghij"),
                   (2, 0, "abc"), (3, 0, "")]
    # full coverage: every char of doc 1 appears in some chunk
    import pytest as _pt
    with _pt.raises(ValueError):
        chunk_documents(df, chunk_chars=0, stride=3)
    with _pt.raises(ValueError):
        chunk_documents(df, chunk_chars=4, stride=0)


def test_chunk_documents_overlap_and_narrow_plan(spark):
    from datacanary_spark.operators.text_analysis import chunk_documents

    df = spark.createDataFrame([(1, "x" * 1000)], "doc_id long, text string")
    out = chunk_documents(df, chunk_chars=100, stride=60)
    rows = out.collect()
    # ceil((1000-100)/60)+1 = 16 chunks; consecutive chunks overlap 40
    assert len(rows) == 16
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


def test_script_fractions_never_exceed_one(spark):
    from datacanary_spark.operators.text_analysis import with_script_mix

    # titlo U+0483 is Cyrillic-script but NOT a letter (Mn): it must
    # count for neither the numerator nor the denominator
    df = spark.createDataFrame([(1, "аб҃")], "doc_id long, text string")
    [r] = with_script_mix(df, scripts=["cyrillic"]).collect()
    assert r["letter_chars"] == 2
    assert r["cyrillic_chars"] == 2
    assert r["cyrillic_frac"] == 1.0


def test_chunk_documents_rejects_gapping_stride(spark):
    from datacanary_spark.operators.text_analysis import chunk_documents

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    import pytest as _pt
    with _pt.raises(ValueError, match="stride"):
        chunk_documents(df, chunk_chars=100, stride=150)
