"""Per-partition lineage rows + corpus metrics (+ skew-safe host rollup).

Generalizes the reference's dataset-level rollups — SummaryStatistics
health score and pass-rates (/root/reference/src/datacanary/analysis/
summary_statistics.py:90-154) — into distributed, append-only metrics:

* ``partition_lineage``: one row per physical partition of the verdict
  DataFrame: (partition_id, input_count, keep_count, drop_count,
  scrub_count, rule_hit_histogram map) — the north rule's lineage table.
* ``corpus_metrics``: one global row (keep rate, per-rule hit rates,
  health score with the reference's 0.7/0.3 weighting).
* ``host_metrics_salted``: per-host keep/drop counts via SALTED
  two-stage aggregation — hot hosts (Zipf head) are split across
  ``n_salts`` partial keys first, then merged, so no single reducer
  receives a hot host's full row stream. This is the explicit skew
  pattern the north rule asks for (plus AQE skew handling is on in
  session.py for joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datacanary_spark.functions.heuristics import FilterConfig


def _hit_sum_map(rule_names) -> F.Column:
    return F.map_from_arrays(
        F.array(*[F.lit(n) for n in rule_names]),
        F.array(*[F.sum(F.element_at(F.col("rule_hits"), n)).cast("long")
                  for n in rule_names]),
    )


def _verdict_rule_names(cfg: FilterConfig, structure_rules: bool) -> list[str]:
    """The rule set a verdict frame's ``rule_hits`` map actually carries:
    text+model rules, plus the structure rules when ``filter_pages`` ran
    with ``structure_rules=True`` — the histogram must account for every
    rule that can drop a document, or drops become unexplainable."""
    names = list(cfg.rule_names)
    if structure_rules:
        names += list(cfg.structure_rule_names)
    return names


def partition_lineage(verdicts: DataFrame, cfg: FilterConfig | None = None,
                      structure_rules: bool = False) -> DataFrame:
    """One lineage row per bucket/partition.

    When the verdicts carry the materialized url-hash ``bucket`` column
    (filter_pages with ``repartition_buckets``), lineage keys on it —
    a pure function of the content, stable across re-reads, file
    packing, and cluster sizes. Without it (e.g. micro-batches that were
    never bucketed) it falls back to ``spark_partition_id()``, which is
    only stable within the plan that produced it.

    Pass ``structure_rules=True`` when the verdicts came from
    ``filter_pages(..., structure_rules=True)`` so the noindex /
    link-density hits appear in the histogram.
    """
    cfg = cfg or FilterConfig()
    rule_names = _verdict_rule_names(cfg, structure_rules)
    # cast unifies the two paths (bucket is a long pmod,
    # spark_partition_id an int) onto LINEAGE_SCHEMA's int partition_id
    pid = (F.col("bucket") if "bucket" in verdicts.columns
           else F.spark_partition_id()).cast("int")
    return (
        verdicts.withColumn("partition_id", pid)
        .groupBy("partition_id")
        .agg(
            F.count(F.lit(1)).alias("input_count"),
            F.sum(F.col("keep").cast("long")).alias("keep_count"),
            F.sum((~F.col("keep")).cast("long")).alias("drop_count"),
            F.sum(F.when(F.col("scrub_count") > 0, 1).otherwise(0))
            .cast("long").alias("scrub_count"),
            _hit_sum_map(rule_names).alias("rule_hit_histogram"),
        )
    )


def corpus_metrics(verdicts: DataFrame, cfg: FilterConfig | None = None,
                   structure_rules: bool = False) -> DataFrame:
    """Global quality metrics incl. the reference's health score:
    0.7 * rule_compliance + 0.3 * completeness, 2dp, banded
    Excellent≥90 / Good≥75 / Fair≥60 / Poor
    (summary_statistics.py:124-140). Here rule_compliance = mean
    per-rule pass rate over documents and completeness = fraction of
    docs with non-null text. ``structure_rules`` as in
    :func:`partition_lineage`."""
    cfg = cfg or FilterConfig()
    rule_names = _verdict_rule_names(cfg, structure_rules)
    n_rules = len(rule_names)
    pass_rate = sum(
        F.avg(F.lit(1) - F.element_at(F.col("rule_hits"), n)) for n in rule_names
    ) / n_rules
    completeness = F.avg(F.col("scrubbed_text").isNotNull().cast("double"))
    score = F.bround((pass_rate * 0.7 + completeness * 0.3) * 100, 2)
    agg = verdicts.agg(
        F.count(F.lit(1)).alias("input_count"),
        F.sum(F.col("keep").cast("long")).alias("keep_count"),
        F.bround(F.avg(F.col("keep").cast("double")) * 100, 2).alias("keep_rate_pct"),
        F.sum(F.col("scrub_count").cast("long")).alias("total_scrubs"),
        _hit_sum_map(rule_names).alias("rule_hit_histogram"),
        score.alias("health_score"),
    )
    return agg.withColumn(
        "health_status",
        # Empty input: every avg() is NULL → score NULL. Falling through
        # to the otherwise() would report 'Poor' health for a corpus
        # that simply has no rows; surface NULL (unknown) instead.
        F.when(F.col("health_score").isNull(), F.lit(None).cast("string"))
        .when(F.col("health_score") >= 90, "Excellent")
        .when(F.col("health_score") >= 75, "Good")
        .when(F.col("health_score") >= 60, "Fair")
        .otherwise("Poor"),
    )


def host_metrics_salted(verdicts: DataFrame, n_salts: int = 16) -> DataFrame:
    """Per-host keep/drop counts with salted two-stage aggregation.

    Stage 1 groups by (host, salt) — a hot host's rows spread over
    ``n_salts`` reducers; stage 2 merges the tiny partials. Spark's
    partial (map-side) aggregation already mitigates skew for simple
    sums; the explicit salt makes the pattern hold for any downstream
    agg (collect/sketch) and demonstrates the north-rule technique.
    """
    salted = verdicts.select(
        F.try_parse_url(F.col("url"), F.lit("HOST")).alias("host"),
        F.col("keep"),
        F.pmod(F.xxhash64("url", F.lit(42)), F.lit(n_salts)).alias("salt"),
    )
    partial = salted.groupBy("host", "salt").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col("keep").cast("long")).alias("kept"),
    )
    return partial.groupBy("host").agg(
        F.sum("cnt").alias("n_docs"),
        F.sum("kept").alias("kept"),
        (F.sum("cnt") - F.sum("kept")).alias("dropped"),
    )
