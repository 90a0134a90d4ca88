"""Gopher-style character-weighted repetition signals as pure Columns.

Extends the count-weighted ``dup_line_fraction`` / ``dup_trigram_fraction``
in :mod:`datacanary_spark.functions.heuristics` with the char-weighted
family from the Gopher paper (Rae et al. 2021, table A1):

* ``top_{n}gram_char_fraction`` (n = 2, 3, 4): fraction of document
  characters covered by ALL occurrences of the single most frequent
  word n-gram, counted only when that gram occurs at least twice (a
  unique gram is not repetition). Gopher drops a doc when e.g.
  top-2-gram > 0.20.
* ``dup_{n}gram_char_fraction`` (n = 5..10): fraction of document
  characters covered by duplicate occurrences (every occurrence AFTER
  the first) of word n-grams — the RedPajama-v2
  ``rps_doc_frac_chars_dup_ngrams`` convention. Gopher drops at
  e.g. dup-5-gram > 0.15.

Deterministic definition (documented deviation from Gopher's exact
span-overlap accounting, which needs positional interval merging):
character coverage of a gram is ``occurrences × length(gram)`` with the
gram's single-space joins included, divided by ``length(text)``, capped
at 1.0 (overlapping n-grams can double-count). Ties for the top gram
break to the lexicographically smallest gram.

Execution shape — this is the part that matters at 100 TB: everything
is a narrow per-row expression. Each n-gram array is bound ONCE as a
named column, sorted, and folded with a single linear ``aggregate``
run-length pass (O(m log m) per doc for the sort; no shuffle, no
Python, no explode — an explode+groupBy(doc, gram) formulation would
shuffle ~9 rows per word of corpus). The DuckDB oracle twin uses the
explode+GROUP BY formulation, which is fine at sf0.01 and proves the
run-length fold correct.

The signals are intentionally NOT part of the default
:class:`~datacanary_spark.functions.heuristics.FilterConfig` rule set —
the keep/drop contract vs the reference's golden labels is frozen.
``gopher_repetition_hit_exprs`` exposes them as an opt-in rule family
for ``curate`` users.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datacanary_spark.functions.heuristics import words_expr

TOP_NS = (2, 3, 4)
DUP_NS = (5, 6, 7, 8, 9, 10)


@dataclass(frozen=True)
class RepetitionConfig:
    """Gopher table-A1 thresholds; a doc "hits" a rule when it EXCEEDS
    the fraction (same violation polarity as FilterConfig)."""

    max_top_ngram_char_fraction: tuple[float, ...] = (0.20, 0.18, 0.16)
    max_dup_ngram_char_fraction: tuple[float, ...] = (
        0.15, 0.14, 0.13, 0.12, 0.11, 0.10)

    def rule_names(self) -> tuple[str, ...]:
        return tuple(
            [f"top_{n}gram_chars" for n in TOP_NS]
            + [f"dup_{n}gram_chars" for n in DUP_NS])


def ngrams_expr(words: Column, n: int) -> Column:
    """Word n-grams joined by single spaces, built linearly.

    ``words`` MUST be a bound column ref (not a raw subtree): the
    per-element lambda slices it once per output gram, so a bound ref
    costs O(n) per gram; an inline ``split()`` subtree would be
    re-evaluated per element (the trigrams_expr lesson,
    heuristics.py:87)."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    wc = F.size(words)
    grams = F.transform(
        F.sequence(F.lit(1), wc - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(words, i, n)))
    return F.when(wc >= n, grams).otherwise(F.array().cast("array<string>"))


def _run_length_fold(sorted_grams: Column) -> Column:
    """One linear pass over a SORTED gram array.

    Returns struct(top_count long, top_gram string, dup_chars long):
    the highest run length (ties → first == lexicographically smallest
    gram), that gram, and sum over grams of (occurrences-1) × length.
    """
    acc0 = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("top_count"),
        F.lit("").alias("top_gram"),
        F.lit(0).cast("long").alias("dup_chars"),
    )

    def step(acc: Column, g: Column) -> Column:
        same = acc["prev"].eqNullSafe(g)
        run = F.when(same, acc["run"] + 1).otherwise(F.lit(1).cast("long"))
        # leaving a run of k>1 identical grams adds (k-1)*len duplicates
        dup = F.when(
            ~same & (acc["run"] > 1),
            acc["dup_chars"] + (acc["run"] - 1) * F.length(acc["prev"]),
        ).otherwise(acc["dup_chars"])
        better = run > acc["top_count"]
        return F.struct(
            g.alias("prev"),
            run.alias("run"),
            F.when(better, run).otherwise(acc["top_count"]).alias("top_count"),
            F.when(better, g).otherwise(acc["top_gram"]).alias("top_gram"),
            dup.alias("dup_chars"),
        )

    def finish(acc: Column) -> Column:
        dup = F.when(
            acc["run"] > 1,
            acc["dup_chars"] + (acc["run"] - 1) * F.length(acc["prev"]),
        ).otherwise(acc["dup_chars"])
        return F.struct(
            acc["top_count"].alias("top_count"),
            acc["top_gram"].alias("top_gram"),
            dup.alias("dup_chars"),
        )

    return F.aggregate(sorted_grams, acc0, step, finish)


def with_repetition_stats(df: DataFrame, text_col: str = "text",
                          prefix: str = "rep_",
                          top_ns: tuple[int, ...] = TOP_NS,
                          dup_ns: tuple[int, ...] = DUP_NS) -> DataFrame:
    """Attach ``<prefix>top_{n}gram_char_fraction`` / ``<prefix>dup_{n}
    gram_char_fraction`` columns (doubles in [0, 1], 0.0 for docs too
    short to form a gram or with empty text).

    Staged projection: words bound once, each gram array bound once,
    each fold bound once — same CollapseProject discipline as
    ``with_text_stats``.
    """
    col = F.col(text_col)
    df = df.withColumns({"_r_words": words_expr(col)})
    w = F.col("_r_words")
    gram_cols = {f"_r_g{n}": F.array_sort(ngrams_expr(w, n))
                 for n in (*top_ns, *dup_ns)}
    df = df.withColumns(gram_cols)
    fold_cols = {f"_r_f{n}": _run_length_fold(F.col(f"_r_g{n}"))
                 for n in (*top_ns, *dup_ns)}
    df = df.withColumns(fold_cols)

    nchars = F.length(col).cast("double")

    def frac(numer: Column) -> Column:
        # coalesce INSIDE least: least() skips nulls, so a null
        # try_divide (empty text) must become 0.0 before the cap
        return F.least(F.lit(1.0), F.coalesce(
            F.try_divide(numer.cast("double"), nchars), F.lit(0.0)))

    out = {}
    for n in top_ns:
        f_ = F.col(f"_r_f{n}")
        # a gram occurring once is not repetition: count it only at >= 2
        out[f"{prefix}top_{n}gram_char_fraction"] = frac(
            F.when(f_["top_count"] >= 2,
                   f_["top_count"] * F.length(f_["top_gram"]))
            .otherwise(F.lit(0)))
    for n in dup_ns:
        f_ = F.col(f"_r_f{n}")
        out[f"{prefix}dup_{n}gram_char_fraction"] = frac(f_["dup_chars"])
    df = df.withColumns(out)
    return df.drop("_r_words", *gram_cols, *fold_cols)


def gopher_repetition_hit_exprs(
        cfg: RepetitionConfig = RepetitionConfig(),
        prefix: str = "rep_") -> dict[str, Column]:
    """Opt-in rule-hit columns over ``with_repetition_stats`` output:
    1 when the doc violates the Gopher threshold (null-safe: null stat
    → violation, matching heuristic_hit_exprs polarity)."""
    # strict zips: a threshold tuple shorter than TOP_NS/DUP_NS would
    # silently drop rules (a user tightening only the 5-gram bound with
    # a 1-tuple would disable dup-6..10 entirely) while rule_names()
    # still advertises all nine — fail loudly instead
    hits: dict[str, Column] = {}
    for n, thr in zip(TOP_NS, cfg.max_top_ngram_char_fraction,
                      strict=True):
        c = F.col(f"{prefix}top_{n}gram_char_fraction")
        hits[f"top_{n}gram_chars"] = F.coalesce(
            (c > thr).cast("int"), F.lit(1))
    for n, thr in zip(DUP_NS, cfg.max_dup_ngram_char_fraction,
                      strict=True):
        c = F.col(f"{prefix}dup_{n}gram_char_fraction")
        hits[f"dup_{n}gram_chars"] = F.coalesce(
            (c > thr).cast("int"), F.lit(1))
    return hits
