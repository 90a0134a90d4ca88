"""Unicode normalization + mojibake repair (functions/normalize.py).

The pure-Python twin for every mutation is the stdlib itself
(unicodedata / codecs), so these tests pin the operator against the
same engine that generates golden fixtures — the byte-identity
discipline of SURVEY.md §7 hard-part 3.
"""

from __future__ import annotations

import unicodedata

import pytest
from pyspark.sql import functions as F

from datacanary_spark.functions import normalize as nz

DECOMPOSED = "Cafe\u0301 du Monde"   # e + combining acute
COMPOSED = "Caf\u00e9 du Monde"       # precomposed \u00e9
LIGATURE = "ﬁne ﬂour"                        # NFC keeps ligatures
MOJIBAKE_CP1252 = "donâ€™t say Ã©clair"      # UTF-8 read as cp1252
REPAIRED = "don’t say éclair"
LATIN1_REAL = "crème brûlée"                 # real text, must NOT change


def _one(spark, s, col):
    row = (spark.createDataFrame([(s,)], "text string")
           .select(col.alias("v")).first())
    return row["v"]


def test_nfc_udf_matches_unicodedata(spark):
    # A+ring combining, marks in non-canonical order, angstrom sign
    for s in (DECOMPOSED, COMPOSED, LIGATURE, "", "A\u030a",
              "x\u0301\u0300y", "\u212b"):
        got = _one(spark, s, nz.make_normalize_udf("NFC")(F.col("text")))
        assert got == unicodedata.normalize("NFC", s)
    assert _one(spark, DECOMPOSED,
                nz.make_normalize_udf("NFC")(F.col("text"))) == COMPOSED


def test_nfkc_folds_ligatures_nfc_does_not(spark):
    nfc = _one(spark, LIGATURE, nz.make_normalize_udf("NFC")(F.col("text")))
    nfkc = _one(spark, LIGATURE,
                nz.make_normalize_udf("NFKC")(F.col("text")))
    assert nfc == LIGATURE
    assert nfkc == "fine flour"


def test_unknown_form_rejected():
    with pytest.raises(ValueError):
        nz.make_normalize_udf("NFX")


def test_fix_mojibake_repairs_cp1252_and_latin1():
    assert nz._fix_one(MOJIBAKE_CP1252) == REPAIRED
    # latin-1-range mojibake (Ã© without cp1252-only chars)
    assert nz._fix_one("Ã©tÃ©") == "été"
    assert nz._fix_one(None) is None
    assert nz._fix_one("plain ascii") == "plain ascii"


def test_fix_mojibake_leaves_genuine_accents_alone():
    # é (0xE9) alone is invalid UTF-8 → round-trip raises → unchanged
    assert nz._fix_one(LATIN1_REAL) == LATIN1_REAL
    # CJK etc. can't encode to latin-1/cp1252 at all → unchanged
    assert nz._fix_one("日本語") == "日本語"


def test_mojibake_count_expr_counts_artifacts(spark):
    cnt = _one(spark, MOJIBAKE_CP1252,
               nz.mojibake_count_expr(F.col("text")).cast("long"))
    assert cnt == 2  # â€™ and Ã©
    assert _one(spark, "clean text",
                nz.mojibake_count_expr(F.col("text")).cast("long")) == 0


def test_no_artifact_is_prefix_of_another():
    # the cross-engine exactness argument for regexp alternation
    # counting (Java leftmost-first vs RE2) requires this
    arts = nz.MOJIBAKE_ARTIFACTS
    for a in arts:
        for b in arts:
            if a is not b:
                assert not b.startswith(a)


def test_normalize_text_pipeline_flags_and_repairs(spark):
    df = spark.createDataFrame(
        [(1, DECOMPOSED), (2, COMPOSED), (3, MOJIBAKE_CP1252), (4, None)],
        "id long, text string")
    out = nz.normalize_text(df, "text", fix_encoding=True)
    rows = {r["id"]: (r["text"], r["text_changed"])
            for r in out.collect()}
    assert rows[1] == (COMPOSED, True)
    assert rows[2] == (COMPOSED, False)
    assert rows[3] == (REPAIRED, True)
    assert rows[4] == (None, False)  # null text: unchanged, flag False


def test_normalize_text_no_shuffle(spark):
    df = spark.createDataFrame([(1, "x")], "id long, text string")
    explained = nz.normalize_text(df, "text", fix_encoding=True) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in explained
