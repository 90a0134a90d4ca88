"""Dataset-card report for a curated corpus.

The corpus-world analogue of the reference's text report
(/root/reference/src/datacanary/reporting/report_generator.py:51-182
renders per-column stats; a TRAINING corpus is described instead by
composition, size, diversity, and provenance). Everything is computed
in two aggregate jobs over tiny outputs (one rollup for the global row
AND the per-language rows, a top-k host list) and rendered driver-side
as markdown — the "dataset card" that accompanies a published corpus.

Scale shape: the rollup is one scan paying the per-doc token /
fingerprint expressions once, with map-side partials; the host table
reuses the same partial-agg + top-k-over-aggregates shape as
top_terms_by_group (rows at the window = |hosts|, never |docs|).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datacanary_spark.functions.heuristics import words_expr
from datacanary_spark.functions.readability import (
    code_line_count_expr,
    flesch_from_counts,
    sentence_count_expr,
    syllables_expr,
)
from datacanary_spark.operators.text_analysis import (
    content_fingerprint,
    token_count_bpe,
    token_count_ws,
)


def corpus_card_stats(corpus: DataFrame, lang_col: str = "lang_pred",
                      text_col: str = "text", url_col: str = "url",
                      top_hosts: int = 10) -> dict:
    """The card's numbers: one global row, per-language rows, top hosts.

    Collected driver-side (all results are tiny). The global AND
    per-language rows come from ONE rollup aggregation (one scan paying
    the per-doc token/fingerprint expressions once; ``F.grouping``
    distinguishes the grand-total row from a genuine NULL language
    group); the host top-k aggregates separately because its key only
    exists for parseable urls, and runs over aggregated hosts.
    """
    lang = F.col(lang_col) if lang_col in corpus.columns else F.lit("all")
    enriched = corpus.select(
        lang.alias("_lang"),
        F.col(text_col).alias("_text"),
        F.length(text_col).alias("_chars"),
        token_count_ws(F.col(text_col)).alias("_ws"),
        token_count_bpe(F.col(text_col)).alias("_bpe"),
        content_fingerprint(F.col(text_col)).alias("_fp"),
        sentence_count_expr(F.col(text_col)).alias("_sc"),
        syllables_expr(words_expr(F.col(text_col))).alias("_syll"),
        code_line_count_expr(F.split(F.col(text_col), "\n")).alias("_code"),
        F.size(F.split(F.col(text_col), "\n")).cast("long").alias("_lines"),
        F.lower(F.expr(f"parse_url({url_col}, 'HOST')")).alias("_host")
        if url_col in corpus.columns else F.lit(None).alias("_host"))

    def aggs():
        return [
            F.count(F.lit(1)).alias("docs"),
            F.sum("_chars").cast("long").alias("chars"),
            F.sum("_ws").cast("long").alias("ws_tokens"),
            F.sum("_bpe").cast("long").alias("bpe_tokens"),
            F.bround(F.avg("_chars"), 1).alias("mean_chars"),
            F.countDistinct("_fp").alias("distinct_fingerprints"),
            F.countDistinct("_host").alias("distinct_hosts"),
            # readability/code sums: exact integers, zero extra cost
            # (same rollup scan); Flesch is derived driver-side
            F.sum("_sc").cast("long").alias("sentences"),
            F.sum("_syll").cast("long").alias("syllables"),
            F.sum("_code").cast("long").alias("code_lines"),
            F.sum("_lines").cast("long").alias("lines"),
        ]

    rolled = (enriched.rollup("_lang")
              .agg(F.grouping("_lang").alias("_g"), *aggs())
              .collect())
    g = next((r.asDict() for r in rolled if r["_g"] == 1),
             # a fully empty corpus rolls up to zero rows — the card
             # must still render with zero counts
             {"_g": 1, "_lang": None, "docs": 0, "chars": 0,
              "ws_tokens": 0, "bpe_tokens": 0, "mean_chars": 0,
              "distinct_fingerprints": 0, "distinct_hosts": 0,
              "sentences": 0, "syllables": 0, "code_lines": 0, "lines": 0})
    by_lang = sorted((r.asDict() for r in rolled if r["_g"] == 0),
                     key=lambda r: (-r["docs"], str(r["_lang"])))
    for d in (g, *by_lang):
        d.pop("_g", None)
        d["lang"] = d.pop("_lang", None)
        # sums/avgs over zero rows are NULL — an empty corpus must
        # still render a card, not crash the formatter
        for k, v in d.items():
            if v is None and k != "lang":
                d[k] = 0
    hosts = (enriched.where(F.col("_host").isNotNull())
             .groupBy("_host").agg(F.count(F.lit(1)).alias("docs")))
    w = Window.orderBy(F.col("docs").desc(), F.col("_host").asc())
    top = [(r["_host"], r["docs"]) for r in
           hosts.withColumn("_r", F.row_number().over(w))
                .where(F.col("_r") <= top_hosts).orderBy("_r").collect()]
    return {"global": g, "by_lang": by_lang, "top_hosts": top}


def _fmt_flesch(g: dict) -> str:
    f = flesch_from_counts(g["ws_tokens"], g["sentences"], g["syllables"])
    return "n/a (no sentences)" if f is None else f"{f:.1f}"


def render_dataset_card(stats: dict, title: str = "corpus",
                        provenance: dict | None = None) -> str:
    """Markdown dataset card from :func:`corpus_card_stats` output plus
    an optional curation_summary.json (provenance: what each stage
    removed)."""
    g = stats["global"]
    dup_pct = (100.0 * (1 - g["distinct_fingerprints"] / g["docs"])
               if g["docs"] else 0.0)
    lines = [
        f"# Dataset card — {title}",
        "",
        "## Size",
        "",
        f"- documents: {g['docs']:,}",
        f"- characters: {g['chars']:,}",
        f"- whitespace tokens: {g['ws_tokens']:,}",
        f"- BPE-ish tokens: {g['bpe_tokens']:,}",
        f"- mean document length: {g['mean_chars']} chars",
        "",
        "## Diversity",
        "",
        f"- distinct content fingerprints: "
        f"{g['distinct_fingerprints']:,} "
        f"({dup_pct:.2f}% residual exact duplication)",
        f"- distinct url hosts: {g['distinct_hosts']:,}",
        "",
        "## Quality signals",
        "",
        f"- Flesch reading ease (corpus): {_fmt_flesch(g)}",
        f"- code-shaped lines: {g['code_lines']:,} of {g['lines']:,} "
        f"({100.0 * g['code_lines'] / g['lines']:.2f}%)"
        if g["lines"] else "- code-shaped lines: 0 of 0",
        "",
        "## Composition by language",
        "",
        "| lang | docs | ws tokens | mean chars |",
        "|---|---|---|---|",
    ]
    for r in stats["by_lang"]:
        lines.append(f"| {r['lang']} | {r['docs']:,} | "
                     f"{r['ws_tokens']:,} | {r['mean_chars']} |")
    if stats["top_hosts"]:
        lines += ["", "## Top hosts", "",
                  "| host | docs |", "|---|---|"]
        lines += [f"| {h} | {n:,} |" for h, n in stats["top_hosts"]]
    if provenance:
        lines += ["", "## Provenance (curation lineage)", ""]
        for k in sorted(provenance):
            v = provenance[k]
            if isinstance(v, (int, float, str)):
                lines.append(f"- {k}: {v}")
    return "\n".join(lines) + "\n"


def build_dataset_card(spark: SparkSession, input_path: str,
                       lang_col: str = "lang_pred",
                       title: str | None = None) -> str:
    """Card for a `curate` output dir (corpus/ + curation_summary.json
    → provenance included) or any plain corpus table."""
    from datacanary_spark.sources.io import read_table, read_text

    provenance = None
    corpus_path = input_path
    # curate-layout detection must be Hadoop-FS aware: curate writes
    # its sidecar via write_text and may live on s3a://… — a local
    # os.path probe would silently misread remote outputs
    try:
        provenance = json.loads(read_text(
            spark, input_path.rstrip("/") + "/curation_summary.json"))
        corpus_path = input_path.rstrip("/") + "/corpus"
    except Exception:
        provenance = None
    corpus = read_table(spark, corpus_path)
    stats = corpus_card_stats(corpus, lang_col=lang_col)
    return render_dataset_card(
        stats, title=title or os.path.basename(os.path.normpath(input_path)),
        provenance=provenance)
