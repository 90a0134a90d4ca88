"""Property-based tests for the readability/code/compression signals:
pure-Python laws of the golden twin (hundreds of examples, no Spark)
plus a hypothesis-driven Spark differential — random texts through
``with_readability`` must match ``golden_readability`` stat-for-stat.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from datacanary_spark.functions.readability import (
    READABILITY_STAT_NAMES,
    golden_compression_ratio,
    golden_readability,
)

# ASCII prose + punctuation + code punctuation + Java-\s whitespace +
# accented/CJK/emoji codepoints (BMP and astral both covered) + the
# Unicode line terminators (NEL/LS/PS) that expose Java's $-anchor
# quirk the \z end anchor was chosen to avoid
_ALPHABET = st.sampled_from(
    list("abcdefghij klmnopqrstuvwxyz.!?;{}()=#\t\n\r\x0b\f")
    + list("ÉüñАб中文😀") + [chr(0x85), chr(0x2028), chr(0x2029)])
_TEXTS = st.text(alphabet=_ALPHABET, max_size=400)


# --- pure-Python twin laws -------------------------------------------------

@given(_TEXTS)
def test_golden_twin_internal_laws(text):
    g = golden_readability(text)
    words = [w for w in __import__("re").split(
        r"[ \t\n\x0B\f\r]+", text) if w]
    lines = text.split("\n")
    assert g["syllable_count"] >= len(words)  # >= 1 syllable per word
    assert 0 <= g["code_line_count"] <= len(lines)
    for frac in ("code_line_fraction", "code_punct_density"):
        assert g[frac] is None or 0.0 <= g[frac] <= 1.0
    # flesch defined iff both denominators exist
    assert (g["flesch"] is None) == (len(words) == 0
                                     or g["sentence_count"] == 0)
    assert set(g) == set(READABILITY_STAT_NAMES)


@given(st.text(alphabet=st.sampled_from(list("abcdef ghij.!")),
               min_size=10, max_size=80))
def test_compression_ratio_laws(text):
    r = golden_compression_ratio(text)
    assert r is not None and r > 0
    # massive repetition always compresses hard (DEFLATE window law)
    assert golden_compression_ratio(text * 50) < 0.3


def test_compression_ratio_none_on_empty():
    assert golden_compression_ratio(None) is None
    assert golden_compression_ratio("") is None


# --- Spark differential ----------------------------------------------------

@settings(max_examples=12, deadline=None)
@given(st.lists(_TEXTS, min_size=1, max_size=8))
def test_spark_matches_golden_twin_on_random_texts(spark, texts):
    from datacanary_spark.functions.readability import with_readability

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id: int, text: string")
    rows = {r["doc_id"]: r for r in with_readability(df).collect()}
    for i, t in enumerate(texts):
        want = golden_readability(t)
        for name in READABILITY_STAT_NAMES:
            got = rows[i]["rd_" + name]
            if want[name] is None:
                assert got is None, (t, name, got)
            elif isinstance(want[name], float):
                assert abs(got - want[name]) < 1e-12, (t, name, got, want)
            else:
                assert got == want[name], (t, name, got, want)
