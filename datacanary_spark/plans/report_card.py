"""Dataset-card report for a curated corpus.

The corpus-world analogue of the reference's text report
(/root/reference/src/datacanary/reporting/report_generator.py:51-182
renders per-column stats; a TRAINING corpus is described instead by
composition, size, diversity, and provenance). Everything is computed
in three aggregate jobs over tiny outputs (one global row, one row per
language, a top-k host list) and rendered driver-side as markdown —
the "dataset card" that accompanies a published corpus.

Scale shape: the global and per-language aggregates are single-scan
hash aggregations with map-side partials; the host table reuses the
same partial-agg + top-k-over-aggregates shape as top_terms_by_group
(rows at the window = |hosts|, never |docs|).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datacanary_spark.operators.text_analysis import (
    content_fingerprint,
    token_count_bpe,
    token_count_ws,
)


def corpus_card_stats(corpus: DataFrame, lang_col: str = "lang_pred",
                      text_col: str = "text", url_col: str = "url",
                      top_hosts: int = 10) -> dict:
    """The card's numbers: one global row, per-language rows, top hosts.

    Collected driver-side (all three results are tiny); the corpus is
    scanned twice (global+language share one cached expression set via
    a single select; hosts aggregate separately because the host key
    only exists for parseable urls).
    """
    lang = F.col(lang_col) if lang_col in corpus.columns else F.lit("all")
    enriched = corpus.select(
        lang.alias("_lang"),
        F.col(text_col).alias("_text"),
        F.length(text_col).alias("_chars"),
        token_count_ws(F.col(text_col)).alias("_ws"),
        token_count_bpe(F.col(text_col)).alias("_bpe"),
        content_fingerprint(F.col(text_col)).alias("_fp"),
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
        ]

    g = enriched.agg(*aggs()).first().asDict()
    by_lang = [r.asDict() for r in
               (enriched.groupBy(F.col("_lang").alias("lang"))
                .agg(*aggs()).orderBy(F.col("docs").desc(), "lang")
                .collect())]
    hosts = (enriched.where(F.col("_host").isNotNull())
             .groupBy("_host").agg(F.count(F.lit(1)).alias("docs")))
    w = Window.orderBy(F.col("docs").desc(), F.col("_host").asc())
    top = [(r["_host"], r["docs"]) for r in
           hosts.withColumn("_r", F.row_number().over(w))
                .where(F.col("_r") <= top_hosts).orderBy("_r").collect()]
    return {"global": g, "by_lang": by_lang, "top_hosts": top}


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
    from datacanary_spark.sources.io import read_table

    provenance = None
    corpus_path = input_path
    summary_path = os.path.join(input_path, "curation_summary.json")
    if os.path.isdir(os.path.join(input_path, "corpus")):
        corpus_path = os.path.join(input_path, "corpus")
        if os.path.exists(summary_path):
            with open(summary_path) as f:
                provenance = json.load(f)
    corpus = read_table(spark, corpus_path)
    stats = corpus_card_stats(corpus, lang_col=lang_col)
    return render_dataset_card(
        stats, title=title or os.path.basename(os.path.normpath(input_path)),
        provenance=provenance)
