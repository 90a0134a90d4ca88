"""Host-scoped boilerplate line detection and removal.

Nav menus, cookie banners, and footers repeat VERBATIM across the pages
of one site but differ between sites — so the global line dedup
(``dedup.dedup_lines``, C4-style) and the per-line quality rule
(``text_analysis.c4_line_keep_pred``) both miss them: globally each
site's footer is too rare to dominate, and it often reads like a
perfectly fine sentence. The web-pipeline fix (CCNet's per-shard hash
filtering, trafilatura's site-level templates) is frequency WITHIN the
host: a line that appears in >= ``min_frac`` of a host's documents
(and at least ``min_docs`` of them) is template, not content.

Scale shape (10^12 docs): one explode to distinct (host, line-md5,
doc) rows, one aggregation keyed on (host, line-md5) — the md5 makes
the shuffle key fixed-width regardless of line length — one broadcast-
or-shuffle join of the verdict back onto exploded lines, and one
re-aggregation per doc to rebuild the text. Hosts are independent, so
the job partitions cleanly by host; a pathological mega-host is a
skewed key like any other (AQE skew split or salting upstream — same
playbook as ``plans/lineage.host_counts_salted``).

The reference repo (a single-process pandas profiler,
``/root/reference/src/datacanary``) has no web-text surface at all;
this operator belongs to the LLM-data-pipeline brief (SURVEY.md §2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["boilerplate_lines", "strip_boilerplate"]


def _line_rows(df: DataFrame, host_col: str, id_col: str, text_col: str):
    """Exploded (host, doc, pos, raw line, trimmed-line md5 key); empty
    trimmed lines get a NULL key (blank lines are never template)."""
    # NOT spread_to_parallelism here: the heavy work is post-explode
    # (the (host, lnkey) aggregation is already parallel after its
    # shuffle), _line_rows runs twice per strip, and the measured A/B
    # at sf0.1 showed the extra full-text exchange is a net loss
    # (1.26s -> 2.11s) — same finding as ngram_counts/oov_stats.
    lines = F.split(F.col(text_col), "\n")
    out = (df.where(F.col(text_col).isNotNull())
             .select(host_col, id_col,
                     F.posexplode(lines).alias("pos", "ln")))
    t = F.trim(F.col("ln"))
    return out.withColumn(
        "lnkey", F.when(t != "", F.md5(t)).otherwise(F.lit(None)))


def boilerplate_lines(df: DataFrame, host_col: str = "host",
                      id_col: str = "doc_id", text_col: str = "text",
                      min_docs: int = 2,
                      min_frac: float = 0.5) -> DataFrame:
    """The per-host template-line table.

    A (host, line) pair is boilerplate when the trimmed line occurs in
    at least ``min_docs`` distinct documents of the host AND in at
    least ``min_frac`` of the host's documents. Frequency is counted
    in DOCUMENTS (distinct doc per line), not occurrences — a page
    that repeats its own footer five times still counts once.

    Returns ``(host, lnkey, ln, n_docs_with_line, host_docs, frac)``
    with ``ln`` one representative raw trimmed line (min, for
    determinism). Null hosts form their own group (null-safe
    aggregation), matching the engine-wide null-group contract.
    """
    rows = _line_rows(df, host_col, id_col, text_col)
    host_docs = (df.where(F.col(text_col).isNotNull())
                 .groupBy(host_col)
                 .agg(F.count(F.lit(1)).alias("host_docs")))
    per_line = (rows.where(F.col("lnkey").isNotNull())
                .select(host_col, id_col, "lnkey", F.trim("ln").alias("lnt"))
                .groupBy(host_col, "lnkey")
                .agg(F.count_distinct(F.col(id_col)).alias("n_docs_with_line"),
                     F.min("lnt").alias("ln")))
    joined = per_line.join(
        host_docs.withColumnRenamed(host_col, "_h"),
        F.col(host_col).eqNullSafe(F.col("_h")), "left").drop("_h")
    frac = F.col("n_docs_with_line").cast("double") / F.col("host_docs")
    return (joined
            .where((F.col("n_docs_with_line") >= min_docs)
                   & (frac >= min_frac))
            .select(host_col, "lnkey", "ln", "n_docs_with_line",
                    "host_docs", frac.alias("frac")))


def strip_boilerplate(df: DataFrame, host_col: str = "host",
                      id_col: str = "doc_id", text_col: str = "text",
                      min_docs: int = 2, min_frac: float = 0.5,
                      broadcast_table: bool = True,
                      templates: DataFrame | None = None) -> DataFrame:
    """Rewrite ``text_col`` with each host's boilerplate lines removed,
    remaining lines re-joined with newlines in original order.

    ``templates`` accepts a precomputed ``boilerplate_lines`` frame
    (any frame with the ``host_col`` and ``lnkey`` columns) so callers
    that already built the detection table — for reporting, or reuse
    across several strip passes — don't pay the full explode +
    count_distinct detection aggregation a second time; when given,
    ``min_docs``/``min_frac`` are ignored (they were baked into the
    table).

    Line order is restored with ``array_sort(collect_list(struct(pos,
    ln)))`` — an aggregation, not a window, so there is no per-doc sort
    spill risk beyond the doc's own line count. Null-text docs pass
    through unchanged; a doc whose every line was template keeps an
    empty string (the caller's quality filter owns the drop policy,
    same contract as ``text_analysis.c4_clean``).

    ``broadcast_table=True`` ships the (host, lnkey) verdict table to
    every executor — right whenever the template table is small
    relative to the corpus (it is: one row per DISTINCT template line
    per host); otherwise the anti-join shuffles on (host, lnkey).
    """
    if templates is None:
        templates = boilerplate_lines(df, host_col, id_col, text_col,
                                      min_docs, min_frac)
    bl = templates.select(F.col(host_col).alias("_bh"),
                          F.col("lnkey").alias("_bk"))
    if broadcast_table:
        bl = F.broadcast(bl)
    rows = _line_rows(df, host_col, id_col, text_col)
    # LEFT join + in-aggregate filter, NOT an anti-join: a doc whose
    # every line is template must still produce a (now empty) rebuilt
    # row — an anti-join would drop all its rows and the rebuild would
    # silently fall back to the original text.
    marked = rows.join(
        bl,
        F.col(host_col).eqNullSafe(F.col("_bh"))
        & (F.col("lnkey") == F.col("_bk")),
        "left").withColumn("_keep", F.col("_bk").isNull())
    rebuilt = (marked.groupBy(id_col)
               .agg(F.array_join(
                   F.transform(
                       F.filter(
                           F.array_sort(F.collect_list(
                               F.struct("pos", "ln", "_keep"))),
                           lambda s: s["_keep"]),
                       lambda s: s["ln"]),
                   "\n").alias("_new_text")))
    out = df.join(rebuilt, id_col, "left")
    new_text = F.when(F.col(text_col).isNull(),
                      F.lit(None).cast("string")) \
        .otherwise(F.coalesce(F.col("_new_text"), F.col(text_col)))
    return out.withColumn(text_col, new_text).drop("_new_text")
