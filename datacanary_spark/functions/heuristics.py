"""Gopher/C4-style heuristic quality rules as pure Column expressions.

This generalizes the reference's profile-level rules (ValueRangeRule →
doc-length / mean-word-length bounds, PatternMatchRule → regex-based
checks; /root/reference/src/datacanary/rules/rule_engine.py:156-316)
into row-level (per-document) predicates that run entirely inside
whole-stage codegen — no Python in the hot path (build contract: no
per-row Python UDFs).

All ratios use exact integer-count arithmetic before a final double
division, so the pandas golden twin (filter/golden.py) reproduces them
bit-for-bit.

Scale: every expression here is a narrow per-row computation — no
shuffle, no state; cost is O(bytes scanned) and pipelined with the
parquet scan under one WholeStageCodegen span (arrays from split() are
materialized once per row and shared by Catalyst CSE).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F

from datacanary_spark.sources.fixtures import STOPWORDS

# union of per-language stopword lists — language-agnostic fraction test
ALL_STOPWORDS: frozenset[str] = frozenset(w for ws in STOPWORDS.values() for w in ws)

SYMBOL_CLASS = "[#$%&*+=~^|]"  # chars counted by the symbol-to-word rule


@dataclass(frozen=True)
class FilterConfig:
    """Thresholds of the quality filter (Gopher/C4-flavored).

    A rule "hits" (value 1) when the document VIOLATES it; keep =
    no heuristic hits AND perplexity/langid accept.
    """

    min_words: int = 50
    max_words: int = 1000
    min_mean_word_length: float = 2.0
    max_mean_word_length: float = 12.0
    max_symbol_to_word_ratio: float = 0.08
    min_stopword_fraction: float = 0.05
    max_dup_line_fraction: float = 0.25
    max_dup_trigram_fraction: float = 0.25
    max_bullet_line_fraction: float = 0.30
    max_ellipsis_line_fraction: float = 0.20
    # Calibrated on the seeded fixture: clean docs score ppl ≤ ~50,
    # gibberish ≥ ~200 (see tests/test_models.py).
    max_ppl: float = 100.0
    min_lang_conf: float = 0.60
    allowed_langs: tuple[str, ...] = ("en", "fr", "es", "de", "zh")

    heuristic_rule_names: tuple[str, ...] = (
        "too_few_words", "too_many_words", "mean_word_length",
        "symbol_ratio", "stopword_fraction", "dup_lines", "dup_trigrams",
        "bullet_lines", "ellipsis_lines",
    )
    model_rule_names: tuple[str, ...] = ("perplexity", "langid")

    @property
    def rule_names(self) -> tuple[str, ...]:
        return self.heuristic_rule_names + self.model_rule_names


def text_stat_exprs(text_col: str = "text") -> dict[str, Column]:
    """Per-document text statistics as named Column expressions.

    Tokenization contract (mirrored exactly by the golden twin):
    words = non-empty splits of the text on ``\\s+``; lines = splits on
    ``\\n``; word trigrams joined with single spaces.
    """
    col = F.col(text_col)
    words = F.filter(F.split(col, r"\s+"), lambda w: w != F.lit(""))
    wc = F.size(words)
    total_word_chars = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w))
    stops = F.array(*[F.lit(s) for s in sorted(ALL_STOPWORDS)])
    stop_count = F.size(F.filter(words, lambda w: F.array_contains(stops, w)))
    symbol_count = F.length(col) - F.length(F.regexp_replace(col, SYMBOL_CLASS, ""))
    lines = F.split(col, "\n")
    lc = F.size(lines)
    trigrams = F.when(
        wc >= 3,
        F.transform(
            F.sequence(F.lit(1), wc - 2),
            lambda i: F.concat_ws(
                " ", F.element_at(words, i), F.element_at(words, i + 1),
                F.element_at(words, i + 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    tg = F.size(trigrams)
    bullet = F.size(F.filter(
        lines, lambda l: l.startswith("- ") | l.startswith("• ") | l.startswith("* ")))
    ellipsis = F.size(F.filter(lines, lambda l: l.endswith("...")))

    return {
        "n_chars": F.length(col).cast("long"),
        "word_count": wc.cast("long"),
        "mean_word_length": F.try_divide(total_word_chars.cast("double"), wc.cast("double")),
        "symbol_to_word_ratio": F.try_divide(symbol_count.cast("double"), wc.cast("double")),
        "stopword_fraction": F.try_divide(stop_count.cast("double"), wc.cast("double")),
        "line_count": lc.cast("long"),
        "dup_line_fraction": F.coalesce(
            F.lit(1.0) - F.try_divide(F.size(F.array_distinct(lines)).cast("double"),
                                      lc.cast("double")), F.lit(0.0)),
        "dup_trigram_fraction": F.coalesce(
            F.lit(1.0) - F.try_divide(F.size(F.array_distinct(trigrams)).cast("double"),
                                      tg.cast("double")), F.lit(0.0)),
        "bullet_line_fraction": F.try_divide(bullet.cast("double"), lc.cast("double")),
        "ellipsis_line_fraction": F.try_divide(ellipsis.cast("double"), lc.cast("double")),
    }


def heuristic_hit_exprs(cfg: FilterConfig, stats: dict[str, Column]) -> dict[str, Column]:
    """Rule-hit columns: 1 when the doc violates the rule, else 0.

    Null stats (e.g. empty text → null ratios) count as violations of the
    rules that need them — mirrors the reference's per-rule error
    containment where an unevaluable rule records passed=False
    (rule_engine.py:368-378).
    """

    def hit(violation: Column) -> Column:
        return F.coalesce(violation.cast("int"), F.lit(1))

    return {
        "too_few_words": hit(stats["word_count"] < cfg.min_words),
        "too_many_words": hit(stats["word_count"] > cfg.max_words),
        "mean_word_length": hit(
            (stats["mean_word_length"] < cfg.min_mean_word_length)
            | (stats["mean_word_length"] > cfg.max_mean_word_length)),
        "symbol_ratio": hit(stats["symbol_to_word_ratio"] > cfg.max_symbol_to_word_ratio),
        "stopword_fraction": hit(stats["stopword_fraction"] < cfg.min_stopword_fraction),
        "dup_lines": hit(stats["dup_line_fraction"] > cfg.max_dup_line_fraction),
        "dup_trigrams": hit(stats["dup_trigram_fraction"] > cfg.max_dup_trigram_fraction),
        "bullet_lines": hit(stats["bullet_line_fraction"] > cfg.max_bullet_line_fraction),
        "ellipsis_lines": hit(stats["ellipsis_line_fraction"] > cfg.max_ellipsis_line_fraction),
    }


def with_text_stats(df, text_col: str = "text", prefix: str = ""):
    """Attach all text-stat columns (names optionally prefixed)."""
    stats = text_stat_exprs(text_col)
    return df.withColumns({prefix + k: v for k, v in stats.items()})
