"""Unicode normalization + encoding-repair for crawled web text.

Real crawls mix producers: macOS filesystems and some CMSes emit NFD
(decomposed) sequences, most of the web emits NFC, and a long tail of
pages was decoded with the wrong charset somewhere upstream and carries
UTF-8-read-as-Latin-1 "mojibake" (``Ã©`` for ``é``, ``â€™`` for ``’``).
CCNet/FineWeb-style pipelines normalize before fingerprinting — two
byte-different spellings of the same text must dedup together — so this
runs BEFORE any hashing stage.

The reference has no unicode handling at all (pandas hands strings
through as decoded); this module is a north-rule addition for the
web-text pipeline, same family as the scrubber
(`/root/reference/src/datacanary/rules/rule_engine.py:237-316` is the
closest reference surface: regex checks over string columns).

Engine split (SURVEY.md §7 hard parts 2/3):

* **Detection is JVM-side.** Mojibake artifacts are fixed literal
  strings — `regexp_count` with a literal alternation behaves
  identically in Java regex and RE2/DuckDB, so detection stays in
  whole-stage codegen and is oracle-checkable.
* **Mutation is Python-side.** NFC/NFKC composition and the
  Latin-1→UTF-8 round-trip repair run in Arrow-batched pandas UDFs
  (``unicodedata`` / ``str.encode``), the same engine that generates
  the golden fixtures — byte-identity discipline, no Java/Python
  normalizer drift. Per-row cost is a few hundred ns; the UDF is a
  narrow map (no shuffle), so at 100 TB it pipelines inside the scan
  stage and costs one Arrow hop, exactly like the scrubber.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# UTF-8 bytes of common non-ASCII chars, mis-decoded as Latin-1/cp1252.
# Literal alternation only — no regex metacharacters — so Java regex
# (Spark) and RE2 (DuckDB) count identically, non-overlapping
# left-to-right in both. Each entry is what you SEE in broken text.
MOJIBAKE_ARTIFACTS: tuple[str, ...] = (
    "â€™",   # â€™  = UTF-8 of ’ (U+2019) read as cp1252
    "â€œ",   # â€œ  = “ (U+201C)
    "â€“",   # â€“  = – (U+2013)
    "â€”",   # â€”  = — (U+2014)
    "Ã©",         # Ã©   = é
    "Ã¨",         # Ã¨   = è
    "Ã¤",         # Ã¤   = ä
    "Ã¶",         # Ã¶   = ö
    "Ã¼",         # Ã¼   = ü
    "Ã±",         # Ã±   = ñ
    "Ã§",         # Ã§   = ç
    "Â ",         # Â·nbsp = U+00A0 double-encoded
)

MOJIBAKE_PATTERN = "|".join(MOJIBAKE_ARTIFACTS)


def mojibake_count_expr(text: Column) -> Column:
    """Number of mojibake artifact occurrences (0 for clean, null for
    null). Pure expression — stays in codegen, pushes nothing to
    Python; usable as a filter predicate or a quality signal."""
    return F.regexp_count(text, F.lit(MOJIBAKE_PATTERN))


def make_normalize_udf(form: str = "NFC"):
    """Arrow-batched ``unicodedata.normalize(form, ·)``; null-safe.

    ``form`` must be NFC/NFKC/NFD/NFKD. NFC is the pipeline default:
    it composes combining sequences (é = e + U+0301 → one codepoint)
    without the lossy compatibility folds of NFKC (ligatures, ², ℕ),
    so extracted text stays byte-faithful to what the page displayed.
    """
    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"unknown normalization form: {form!r}")

    @pandas_udf(T.StringType())
    def _normalize(s: pd.Series) -> pd.Series:
        return s.map(
            lambda x: unicodedata.normalize(form, x) if x is not None
            else None)

    return _normalize


def _fix_one(x: str | None) -> str | None:
    """ftfy-lite single-pass repair: if the string's codepoints, written
    back out under the charset that mis-decoded them (Latin-1, else
    cp1252 — the Windows default that maps 0x80-0x9F to €™’“”…), form
    valid UTF-8, the text was decoded with the wrong charset upstream —
    re-decode it. Genuine Latin-1 text survives untouched: a lone é
    (0xE9) is invalid UTF-8, the round-trip raises, and we return the
    input. Strict single pass — doubly-mojibake'd text would need two,
    but repairing repeatedly risks eating legitimate text that merely
    LOOKS mojibake'd.
    """
    if x is None:
        return None
    for enc in ("latin-1", "cp1252"):
        try:
            return x.encode(enc).decode("utf-8")
        except (UnicodeEncodeError, UnicodeDecodeError):
            continue
    return x


@pandas_udf(T.StringType())
def fix_mojibake_udf(s: pd.Series) -> pd.Series:
    return s.map(_fix_one)


def normalize_text(df: DataFrame, text_col: str = "text",
                   form: str | None = "NFC", fix_encoding: bool = False,
                   changed_col: str | None = "text_changed") -> DataFrame:
    """Normalize ``text_col`` in place (optionally repairing mojibake
    first — repair must precede NFC so repaired sequences get composed
    too), plus a boolean ``changed_col`` marking rows the pass touched
    (lineage: how much of the corpus was denormalized).
    ``form=None`` skips composition (repair-only pass); at least one of
    the two transforms must be enabled.

    Plan shape: one narrow projection, one Arrow exchange, no shuffle.
    At 10^12 docs this fuses into the ingest scan stage.
    """
    if form is None and not fix_encoding:
        raise ValueError("normalize_text with form=None and "
                         "fix_encoding=False would be a no-op")
    out = df
    original = F.col(text_col)
    fixed = fix_mojibake_udf(original) if fix_encoding else original
    normalized = make_normalize_udf(form)(fixed) if form is not None \
        else fixed
    if changed_col is not None:
        out = out.withColumn(
            changed_col, F.coalesce(normalized != original, F.lit(False)))
    return out.withColumn(text_col, normalized)
