"""Corpus-level statistics and sampling operators.

The corpus-curation tier of a training-data pipeline: vocabulary
statistics (what the corpus contains) and deterministic stratified
sampling (how to mix it). Everything is a pure DataFrame plan — no
Python in the hot path, no driver-side iteration.

Reference lineage: the reference's per-column profiling
(/root/reference/src/datacanary/analysers/statistical_analyser.py)
stops at single-column aggregates; these extend the same "describe the
data" job to corpus-wide term statistics, which is what the same user
needs once the "column" is a web-scale text corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from datacanary_spark.operators.text_analysis import words_expr


def top_terms_by_group(df: DataFrame, text_col: str = "text",
                       group_col: str = "lang", k: int = 5,
                       min_len: int = 1) -> DataFrame:
    """Top-k most frequent terms per group (vocabulary head).

    Shape: explode words → groupBy(group, term) count → per-group
    top-k. The explode is narrow; the count shuffle is the real work
    and map-side partial aggregation collapses each task's repeats
    before the exchange (hot terms like "the" ship one partial row per
    task, not one row per occurrence). The top-k window runs over the
    AGGREGATED vocabulary (|vocab| rows per group, not corpus rows) —
    per-group skew is bounded by vocabulary size, which grows ~log with
    corpus size (Heaps' law), so the plan survives the 100× scale-up
    that a window over raw tokens would not.

    Deterministic tie-break: count desc, then term asc.
    """
    words = df.select(
        F.col(group_col),
        F.explode(words_expr(F.col(text_col))).alias("term"))
    counts = (words.where(F.length("term") >= min_len)
              .groupBy(group_col, "term")
              .agg(F.count(F.lit(1)).alias("n")))
    w = Window.partitionBy(group_col).orderBy(F.col("n").desc(),
                                              F.col("term").asc())
    return (counts.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


def hash_sample_predicate(key_col: Column, fraction: float,
                          salt: str = "sample") -> Column:
    """Deterministic keep/drop predicate for hash-based sampling.

    Row kept iff the first 8 hex chars of md5(salt:key) fall below
    ``fraction`` of the hex space — a pure function of the key, so the
    SAME rows are selected on any cluster size, any partitioning, any
    engine (DuckDB computes the identical predicate), and re-runs are
    reproducible. This is what ``df.sample``/``sampleBy`` (rand() per
    row, partitioning-dependent) cannot give a resumable 100-TB job.

    The threshold is precomputed in Python and compared LEXICOGRAPHICALLY:
    fixed-width lowercase hex compare == numeric compare, so no
    hex→int conversion is needed in either engine.
    """
    return _bucket_expr(key_col, salt) < F.lit(_hex_threshold(fraction))


def _bucket_expr(key_col: Column, salt: str) -> Column:
    """First 8 hex chars of md5(salt:key) — THE sampling bucket. Every
    sampling entry point (predicate, stratified, oracle SQL) must agree
    on this byte-for-byte or determinism across runs/engines breaks."""
    return F.substring(
        F.md5(F.concat_ws(":", F.lit(salt), key_col.cast("string"))), 1, 8)


def _hex_threshold(fraction: float) -> str:
    """8-hex-char lexicographic threshold for ``fraction`` of the space.

    fraction 1.0 needs care: 16^8 formats to NINE hex digits
    ("100000000"), which sorts BELOW most 8-char hashes and silently
    keeps ~1/16 of rows instead of all of them. "g" sorts above every
    hex digit, making the predicate vacuously true.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1]: {fraction}")
    n = int(round(fraction * 16**8))
    return "g" if n >= 16**8 else f"{n:08x}"


def hash_stratified_sample(df: DataFrame, strata_col: str,
                           fractions: dict[str, float], key_col: str,
                           salt: str = "sample",
                           default_fraction: float = 0.0) -> DataFrame:
    """Deterministic stratified sample: per-stratum keep fractions.

    The corpus-mixing primitive (e.g. keep 100% of books, 10% of
    common-crawl): one narrow filter, no shuffle, no state; fractions
    arrive as a plan-literal CASE over the stratum column. Strata not
    listed get ``default_fraction``.
    """
    thresholds = {s: _hex_threshold(f_) for s, f_ in fractions.items()}
    bucket = _bucket_expr(F.col(key_col), salt)
    thr = F.lit(_hex_threshold(default_fraction))
    for stratum, t in thresholds.items():
        thr = F.when(F.col(strata_col) == stratum, F.lit(t)).otherwise(thr)
    return df.where(bucket < thr)
