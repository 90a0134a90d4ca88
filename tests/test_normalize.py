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


def test_curate_normalize_stage(spark, tmp_path):
    """normalize_unicode + fix_encoding as a curate stage: lineage
    counts exactly the injected dirty rows; no decomposed sequence or
    mojibake artifact survives into the output corpus."""
    import numpy as np

    from datacanary_spark.plans.curate import run_curation_job
    from datacanary_spark.schema import PAGES_SCHEMA
    from datacanary_spark.sources.fixtures import (
        _insert_lines,
        _sample_words,
        write_pages_parquet,
    )

    pages = str(tmp_path / "pages")
    write_pages_parquet(pages, 60, seed=5, chunk_size=30)
    rng = np.random.default_rng(7)
    # two docs need NFC composition, two need mojibake repair -- kept
    # separate: the whole-string round-trip repair (correctly) refuses
    # strings mixing genuine non-ASCII with artifacts
    dirty = [(f"http://dirty.example/{i}", None, None,
              _insert_lines(rng, _sample_words(rng, "en", 200))
              + (" Cafe\u0301" if i % 2 == 0
                 else " don\u00e2\u20ac\u2122t"), "en")
             for i in range(4)]
    spark.createDataFrame(dirty, PAGES_SCHEMA).coalesce(1) \
        .write.mode("append").parquet(pages)
    out = str(tmp_path / "out")
    s = run_curation_job(spark, pages, out,
                         normalize_unicode="NFC", fix_encoding=True)
    assert s["normalized_docs"] == 4
    got = spark.read.parquet(out + "/corpus")
    assert got.count() == s["final_docs"] > 0
    bad = got.where(F.col("text").contains("\u0301")
                    | F.col("text")
                        .contains("\u00e2\u20ac\u2122")).count()
    assert bad == 0


def test_curate_normalize_rejects_html_extraction(spark, tmp_path):
    from datacanary_spark.plans.curate import run_curation_job

    with pytest.raises(ValueError, match="extract_from_html"):
        run_curation_job(spark, "in", "out", normalize_unicode="NFC",
                         extract_from_html=True)
    with pytest.raises(ValueError, match="NFC/NFKC"):
        run_curation_job(spark, "in", "out", normalize_unicode="nfc")


def test_normalize_text_repair_only_and_noop_guard(spark):
    df = spark.createDataFrame([(MOJIBAKE_CP1252,), (DECOMPOSED,)],
                               "text string")
    out = {r["text"] for r in
           nz.normalize_text(df, "text", form=None,
                             fix_encoding=True).collect()}
    assert REPAIRED in out          # repaired
    assert DECOMPOSED in out        # form=None: NOT composed
    with pytest.raises(ValueError):
        nz.normalize_text(df, "text", form=None, fix_encoding=False)
