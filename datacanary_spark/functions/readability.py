"""Readability, code-detection, and compressibility quality signals.

Extends the Gopher/C4 heuristic family (functions/heuristics.py) with
three classic web-filter signals used by CCNet/RefinedWeb-style
pipelines:

- **Flesch reading ease** from integer sentence/word/syllable counts
  (syllables via the standard vowel-group proxy — ``[aeiouy]+`` runs on
  the lowercased word, min 1 per word; a documented Latin-script
  approximation, deterministic and expression-only).
- **Code-line detection** — fraction of lines matching code-shaped
  regexes (trailing ``;``/braces, deep indentation, ``=>``, keyword
  prefixes) plus the density of code punctuation characters. Catches
  source dumps / minified JS pretending to be prose.
- **Compression ratio** — zlib-compressed bytes over raw UTF-8 bytes
  (pandas UDF; zlib level pinned for determinism). Boilerplate-heavy or
  repetitive spam compresses far below prose (~0.4): a low ratio is a
  language-agnostic repetition signal that complements the exact
  dup-line/dup-trigram fractions.

Reference lineage: these generalize the reference's numeric profile
rules (ValueRangeRule over derived stats,
/root/reference/src/datacanary/rules/rule_engine.py:156-316) to
row-level signals, same as functions/heuristics.py.

Scale: the expression signals are narrow per-row computations fused
into the scan's WholeStageCodegen span — no shuffle, no Python. The
compression UDF is the one Python hop; it is Arrow-batched
(pandas_udf), stateless, and O(bytes) per row, so it pipelines with the
scan and adds no shuffle — at 100 TB it is pure map work that scales
with executors.
"""

from __future__ import annotations

import re
import zlib

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from datacanary_spark.functions.heuristics import words_expr

# Sentence boundary: runs of terminal punctuation. Splits, then drops
# whitespace-only fragments (so "Hi! " is ONE sentence, not two).
SENTENCE_SPLIT_RE = r"[.!?]+"

# Vowel-group syllable proxy (classic Flesch implementations); applied
# to the lowercased word, floored at 1 syllable per word.
VOWEL_GROUP_RE = "[aeiouy]+"

# A line "looks like code" when any of these match: statement
# terminators / braces at end-of-line, 4+ space indentation, arrow
# functions, or common keyword prefixes. Pure RE2-compatible subset so
# the DuckDB oracle runs the identical pattern. End-of-line is \z (end
# of INPUT), not $: Java's non-MULTILINE $ also matches before a final
# U+2028/U+2029/U+0085 line terminator, which neither RE2 nor the
# Python twin does — \z means the same thing in all three engines
# (Python spells it \Z; the twin translates). Whitespace is the
# EXPLICIT class [ \t\n\x0B\f\r] (Java's ASCII \s), never \s: RE2's \s
# excludes U+000B vertical tab while Java's includes it, so a \s here
# would make a \x0B-indented line code-shaped in Spark but not in the
# DuckDB oracle (repo CONTROL_CHAR_PATTERN convention; ADVICE r04).
_WS_CLASS = r"[ \t\n\x0B\f\r]"
_NON_WS_CLASS = r"[^ \t\n\x0B\f\r]"
CODE_LINE_RE = (r"([;{}]" + _WS_CLASS + r"*\z)"
                r"|(^" + _WS_CLASS + r"{4,}" + _NON_WS_CLASS + r")|(=>)"
                r"|(\bdef )|(\bfunction )|(\breturn )|(#include)|(\bimport )")

# Characters over-represented in source code relative to prose.
CODE_PUNCT_CLASS = r"[{}\[\]()<>;=]"

# Flesch reading-ease constants (Flesch 1948).
_FLESCH_BASE, _FLESCH_SENT, _FLESCH_SYLL = 206.835, 1.015, 84.6

# zlib level is part of the signal's definition: ratios are only
# comparable across runs/corpora when the level is pinned.
ZLIB_LEVEL = 6

READABILITY_STAT_NAMES = (
    "sentence_count", "syllable_count", "flesch",
    "code_line_count", "code_line_fraction", "code_punct_density",
)


def sentence_count_expr(col: Column) -> Column:
    """Count of non-blank fragments after splitting on ``[.!?]+``."""
    return F.size(F.filter(F.split(col, SENTENCE_SPLIT_RE),
                           lambda s: F.trim(s) != F.lit(""))).cast("long")


def syllables_expr(words: Column) -> Column:
    """Total vowel-group syllables over a words array (≥1 per word)."""
    return F.aggregate(
        words, F.lit(0).cast("long"),
        lambda acc, w: acc + F.greatest(
            F.regexp_count(F.lower(w), F.lit(VOWEL_GROUP_RE)), F.lit(1)))


def flesch_expr(word_count: Column, sentence_count: Column,
                syllables: Column) -> Column:
    """Flesch reading ease from integer counts (null when wc or sc is 0).

    Taking counts (not text) lets callers aggregate counts per group
    first and compute a corpus-level score from exact integer sums —
    order-insensitive, so Spark and a single-threaded oracle agree
    bit-for-bit.
    """
    return (F.lit(_FLESCH_BASE)
            - F.lit(_FLESCH_SENT) * F.try_divide(
                word_count.cast("double"), sentence_count.cast("double"))
            - F.lit(_FLESCH_SYLL) * F.try_divide(
                syllables.cast("double"), word_count.cast("double")))


def code_line_count_expr(lines: Column) -> Column:
    """Number of lines matching ``CODE_LINE_RE``."""
    return F.size(F.filter(lines, lambda l: l.rlike(CODE_LINE_RE))).cast("long")


def code_punct_count_expr(col: Column) -> Column:
    """Count of code-punctuation characters in the text."""
    return (F.length(col)
            - F.length(F.regexp_replace(col, CODE_PUNCT_CLASS, ""))).cast("long")


def with_readability(df, text_col: str = "text", prefix: str = "rd_"):
    """Attach readability/code signals as ``prefix<name>`` columns.

    Same staged-project pattern as heuristics.with_text_stats: the
    words/lines arrays bind to named columns once per row, every signal
    reads the bound column, and the whole block stays one narrow
    WholeStageCodegen span.
    """
    col = F.col(text_col)
    stage1 = {"_rd_words": words_expr(col), "_rd_lines": F.split(col, "\n")}
    df = df.withColumns(stage1)
    w, lines = F.col("_rd_words"), F.col("_rd_lines")
    stage2 = {
        "_rd_wc": F.size(w).cast("long"),
        "_rd_sc": sentence_count_expr(col),
        "_rd_syll": syllables_expr(w),
        "_rd_code": code_line_count_expr(lines),
        "_rd_lc": F.size(lines).cast("long"),
    }
    df = df.withColumns(stage2)
    df = df.withColumns({
        prefix + "sentence_count": F.col("_rd_sc"),
        prefix + "syllable_count": F.col("_rd_syll"),
        prefix + "flesch": flesch_expr(
            F.col("_rd_wc"), F.col("_rd_sc"), F.col("_rd_syll")),
        prefix + "code_line_count": F.col("_rd_code"),
        prefix + "code_line_fraction": F.try_divide(
            F.col("_rd_code").cast("double"), F.col("_rd_lc").cast("double")),
        prefix + "code_punct_density": F.try_divide(
            code_punct_count_expr(col).cast("double"),
            F.length(col).cast("double")),
    })
    return df.drop(*stage1, *stage2)


def make_compression_ratio_udf():
    """Arrow-batched pandas UDF: zlib(level 6) bytes / raw UTF-8 bytes.

    Null or empty text → null (no bytes to compress). Stateless — no
    model broadcast needed; each Arrow batch compresses independently.
    """

    @pandas_udf(T.DoubleType())
    def compression_ratio(texts: pd.Series) -> pd.Series:
        def one(t):
            if t is None:
                return None
            raw = t.encode("utf-8")
            if not raw:
                return None
            return len(zlib.compress(raw, ZLIB_LEVEL)) / len(raw)
        return texts.map(one)

    return compression_ratio


# ----- pure-Python golden twin (tests only) --------------------------------
# Mirrors the Java regex semantics exactly: Java's \s is ASCII-only, so
# the twin uses the explicit class (same trick as golden.py:37).
_WS = re.compile(r"[ \t\n\x0B\f\r]+")
_SENT = re.compile(SENTENCE_SPLIT_RE)
_VOWELS = re.compile(VOWEL_GROUP_RE)
# re.ASCII pins \b to Java's ASCII-only word chars; whitespace is
# already the explicit class in CODE_LINE_RE itself; Python spells
# end-of-input \Z where Java/RE2 spell it \z.
_CODE = re.compile(CODE_LINE_RE.replace(r"\z", r"\Z"), re.ASCII)
_PUNCT = re.compile(CODE_PUNCT_CLASS)


def golden_readability(text: str | None) -> dict:
    """Reference implementation of every signal (plain Python), used by
    tests to pin the Spark expressions' semantics bit-for-bit."""
    if text is None:
        return {n: None for n in READABILITY_STAT_NAMES}
    words = [w for w in _WS.split(text) if w]
    lines = text.split("\n")
    wc = len(words)
    # Spark's trim() (and DuckDB's) strips ONLY space characters — a
    # fragment of just "\n" counts as a sentence in all three engines.
    sc = sum(1 for s in _SENT.split(text) if s.strip(" ") != "")
    syll = sum(max(1, len(_VOWELS.findall(w.lower()))) for w in words)
    code = sum(1 for l in lines if _CODE.search(l))
    lc = len(lines)
    flesch = (None if wc == 0 or sc == 0 else
              _FLESCH_BASE - _FLESCH_SENT * (wc / sc)
              - _FLESCH_SYLL * (syll / wc))
    punct = len(_PUNCT.findall(text))
    return {
        "sentence_count": sc,
        "syllable_count": syll,
        "flesch": flesch,
        "code_line_count": code,
        "code_line_fraction": (code / lc) if lc else None,
        "code_punct_density": (punct / len(text)) if len(text) else None,
    }


def flesch_from_counts(word_count: int, sentence_count: int,
                       syllables: int) -> float | None:
    """Flesch reading ease from integer counts (driver-side twin of
    flesch_expr; None when a denominator is zero)."""
    if not word_count or not sentence_count:
        return None
    return (_FLESCH_BASE - _FLESCH_SENT * (word_count / sentence_count)
            - _FLESCH_SYLL * (syllables / word_count))


def golden_compression_ratio(text: str | None) -> float | None:
    """Twin of the compression UDF (identical zlib call)."""
    if text is None:
        return None
    raw = text.encode("utf-8")
    if not raw:
        return None
    return len(zlib.compress(raw, ZLIB_LEVEL)) / len(raw)
