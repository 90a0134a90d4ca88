"""Readability / code-detection / compression signals: Spark expressions
pinned bit-for-bit against the pure-Python golden twin, plus plan checks
(expressions stay Python-free; the compression UDF is Arrow-batched)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from datacanary_spark.functions.readability import (
    READABILITY_STAT_NAMES,
    golden_compression_ratio,
    golden_readability,
    make_compression_ratio_udf,
    with_readability,
)

PROSE = ("The quick brown fox jumps over the lazy dog. It was a bright "
         "morning, and everyone agreed the weather could not be better! "
         "Would it last? Nobody knew for sure.")
CODE = ("import os\n"
        "def main():\n"
        "    total = 0;\n"
        "    for i in range(10) {\n"
        "        total += i;\n"
        "    }\n"
        "    return total\n")
SPAM = "buy now " * 120
BULLETS = "short. list\n- one thing...\n- two thing...\nEnd of it all."
EDGE_CASES = [
    None,
    "",
    "\n\n\n",
    "no terminal punctuation at all",
    "!!!???...",
    "Ünïcödé wörds. Ünd mörę!",   # non-ASCII vowels NOT in [aeiouy]
    "x",                          # one consonant word → still 1 syllable
]
ALL_TEXTS = [PROSE, CODE, SPAM, BULLETS, *EDGE_CASES]


@pytest.fixture(scope="module")
def sig_df(spark):
    rows = [(i, t) for i, t in enumerate(ALL_TEXTS)]
    df = spark.createDataFrame(rows, "doc_id: int, text: string")
    return with_readability(df).orderBy("doc_id")


def test_signals_match_golden_twin(sig_df):
    got = sig_df.collect()
    assert len(got) == len(ALL_TEXTS)
    for row, text in zip(got, ALL_TEXTS):
        want = golden_readability(text)
        for name in READABILITY_STAT_NAMES:
            g = row["rd_" + name]
            w = want[name]
            if w is None or (text is not None and name == "flesch"
                             and w is None):
                assert g is None, (text, name, g)
            elif isinstance(w, float):
                assert g == pytest.approx(w, abs=0, rel=0) or g == w, \
                    (text, name, g, w)
            else:
                assert g == w, (text, name, g, w)


def test_code_detection_separates_code_from_prose(sig_df):
    vals = {r["doc_id"]: r for r in sig_df.collect()}
    code_row, prose_row = vals[1], vals[0]
    assert code_row["rd_code_line_fraction"] > 0.5
    assert prose_row["rd_code_line_fraction"] == 0.0
    assert code_row["rd_code_punct_density"] > prose_row["rd_code_punct_density"]


def test_flesch_sane_on_prose(sig_df):
    flesch = sig_df.filter(F.col("doc_id") == 0).collect()[0]["rd_flesch"]
    # PROSE is plain English: reading ease should land in a sane band.
    assert 50.0 < flesch < 110.0
    assert flesch == pytest.approx(golden_readability(PROSE)["flesch"])


def test_compression_ratio_matches_zlib_exactly(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(ALL_TEXTS)],
                               "doc_id: int, text: string")
    ratio = make_compression_ratio_udf()(F.col("text"))
    got = {r["doc_id"]: r["r"]
           for r in df.select("doc_id", ratio.alias("r")).collect()}
    for i, t in enumerate(ALL_TEXTS):
        want = golden_compression_ratio(t)
        if want is None:
            assert got[i] is None
        else:
            assert got[i] == want, (i, got[i], want)  # identical zlib call


def test_compression_separates_spam_from_prose(spark):
    # repetitive spam compresses hard; prose does not
    p = golden_compression_ratio(PROSE)
    s = golden_compression_ratio(SPAM)
    assert s < 0.15 < p


def test_expression_signals_stay_python_free(spark):
    df = spark.createDataFrame([(1, PROSE)], "doc_id: int, text: string")
    plan = with_readability(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # pure codegen expressions


def test_compression_udf_is_arrow_batched(spark):
    df = spark.createDataFrame([(1, PROSE)], "doc_id: int, text: string")
    out = df.select(make_compression_ratio_udf()(F.col("text")).alias("r"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan  # never the row-at-a-time path


def test_flesch_null_when_no_sentences(sig_df):
    # unpunctuated prose is still ONE sentence fragment…
    row = [r for r in sig_df.collect()
           if r["doc_id"] == ALL_TEXTS.index("no terminal punctuation at all")][0]
    assert row["rd_sentence_count"] == 1
    # …and trim() is space-only in Spark/DuckDB, so a newline-only doc
    # still counts one fragment (golden twin mirrors this):
    row = [r for r in sig_df.collect()
           if r["doc_id"] == ALL_TEXTS.index("\n\n\n")][0]
    assert row["rd_sentence_count"] == 1
    assert row["rd_flesch"] is None  # zero words → try_divide → null
    # only the empty string has zero sentence fragments
    row = [r for r in sig_df.collect() if r["doc_id"] == ALL_TEXTS.index("")][0]
    assert row["rd_sentence_count"] == 0
    assert row["rd_flesch"] is None


def test_syllable_floor_is_one_per_word(sig_df):
    row = [r for r in sig_df.collect() if r["doc_id"] == ALL_TEXTS.index("x")][0]
    assert row["rd_syllable_count"] == 1


def test_golden_flesch_formula():
    # hand-check: 10 words, 2 sentences, 14 syllables
    t = "One two three four five six seven eight. Nine ten end now!"
    g = golden_readability(t)
    wc, sc, syll = 12, 2, g["syllable_count"]
    want = 206.835 - 1.015 * (wc / sc) - 84.6 * (syll / wc)
    assert math.isclose(g["flesch"], want)
