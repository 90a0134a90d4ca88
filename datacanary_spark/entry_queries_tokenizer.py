"""Driver-contract queries: BPE tokenizer-training statistics
(operators/bpe.py), Unigram-LM seed-lexicon statistics
(operators/unigram.py), and CCNet perplexity-tercile bucketing
(operators/ngram_lm.py composed with ntile).

Registered into datacanary_spark.entry_queries.{QUERIES,ORACLE_SQL}.
All are deliberately tail-registered: the driver's correctness gate
reads exactly the first 50 keys and that window is fully packed with
queries that have never had a driver row — these are verified instead
by ``scripts/check_oracle.py`` (recorded in BENCH/BASELINE.md) like
the rest of the tail.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from datacanary_spark.entry_queries import _TOKS, _t, register
from datacanary_spark.entry_queries_lm import _SB_SCORE_CTES
from datacanary_spark.operators import unigram as ug
from datacanary_spark.operators import bpe
from datacanary_spark.operators import ngram_lm as nl


@register(
    "bpe_top_pairs_by_lang",
    f"""
    WITH {_TOKS},
    wf AS (SELECT lang, w, count(*) AS c FROM toks GROUP BY 1, 2),
    p AS (
      SELECT lang, substring(w, CAST(i AS INT), 2) AS pair, c
      FROM wf, unnest(range(1, length(w))) AS t(i)
    ),
    pc AS (
      SELECT lang, pair, CAST(sum(c) AS BIGINT) AS pair_count
      FROM p GROUP BY 1, 2
    )
    SELECT lang, pair, pair_count,
           CAST(row_number() OVER (PARTITION BY lang
                                   ORDER BY pair_count DESC, pair ASC)
                AS INT) AS rank
    FROM pc
    QUALIFY row_number() OVER (PARTITION BY lang
                               ORDER BY pair_count DESC, pair ASC) <= 5
    """,
)
def bpe_top_pairs_by_lang(spark, sf_dir):
    """Top-5 first-iteration BPE merge candidates per language: adjacent
    character-pair frequencies weighted by word frequency — the
    statistic ``learn_bpe_merges`` greedily maximizes. Both the pair
    table and the ranking window are vocabulary-sized (Heaps' law), so
    the corpus contributes exactly one explode + one aggregation."""
    d = _t(spark, sf_dir, "documents")
    return bpe.top_pairs_by_group(d, "text", "lang", k=5)


@register(
    "unigram_seed_candidates_by_lang",
    f"""
    WITH {_TOKS},
    wf AS (SELECT lang, w, count(*) AS c FROM toks GROUP BY 1, 2),
    subs AS (
      SELECT lang,
             substring(w, CAST(i AS INT), CAST(L AS INT)) AS sub, c
      FROM wf,
           unnest(range(1, length(w) + 1)) AS t(i),
           unnest(range(1, least(4, length(w) - CAST(i AS INT) + 1) + 1))
             AS u(L)
    ),
    agg AS (
      SELECT lang, sub, CAST(sum(c) AS BIGINT) AS sub_count
      FROM subs GROUP BY 1, 2
    )
    SELECT lang, sub, sub_count,
           CAST(row_number() OVER (PARTITION BY lang
                                   ORDER BY sub_count DESC, sub ASC)
                AS INT) AS rank
    FROM agg
    QUALIFY row_number() OVER (PARTITION BY lang
                               ORDER BY sub_count DESC, sub ASC) <= 5
    """,
)
def unigram_seed_candidates_by_lang(spark, sf_dir):
    """Top-5 Unigram-LM seed-lexicon candidates per language: every
    ≤4-char substring of every word, weighted by word frequency — the
    statistic ``train_unigram`` seeds its EM from (SentencePiece's
    frequent-substring seeding). Like the BPE twin, the substring
    explode runs over the AGGREGATED vocabulary (one corpus-sized
    explode + aggregation, then vocabulary-sized work), and the
    ranking window's per-group input is |substrings| ≤ |vocab|·O(len·4)
    — bounded by Heaps' law, not corpus size."""
    d = _t(spark, sf_dir, "documents")
    sc = ug.substring_counts(d, "text", max_len=4, group_cols=("lang",))
    w = Window.partitionBy("lang").orderBy(
        F.col("sub_count").desc(), F.col("sub").asc())
    return (sc.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= 5))


@register(
    "ccnet_ppl_buckets_by_lang",
    f"""
    WITH {_TOKS},
    {_SB_SCORE_CTES},
    b AS (
      SELECT lang, ds,
             ntile(3) OVER (PARTITION BY lang
                            ORDER BY round(ds, 6) DESC, doc_id ASC) AS t
      FROM per_doc
    )
    SELECT lang,
           CASE t WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                  ELSE 'tail' END AS bucket,
           count(*) AS n_docs,
           round(avg(ds), 4) AS mean_sb_log10
    FROM b GROUP BY 1, 2
    """,
)
def ccnet_ppl_buckets_by_lang(spark, sf_dir):
    """CCNet's signature stage (Wenzek et al. 2020): bucket each
    language's documents into head/middle/tail perplexity terciles
    under the corpus LM — downstream pipelines keep head+middle and
    drop (or downsample) tail. Tercile assignment is ntile over the
    per-doc Stupid-Backoff score ROUNDED to 6 dp (so byte-duplicate
    docs whose float sums differ only in summation order tie exactly)
    with doc_id as the deterministic tie-break; the window partitions
    by language, so per-group skew is bounded by the language split,
    and its input is one row per document — not per token."""
    d = _t(spark, sf_dir, "documents")
    counts = nl.ngram_counts(d, n=3)
    scored = nl.score_stupid_backoff(
        d, counts, id_cols=("doc_id", "lang"), n=3)
    w = Window.partitionBy("lang").orderBy(
        F.bround(F.col("sb_logscore"), 6).desc(), F.col("doc_id").asc())
    bucket = (F.when(F.col("t") == 1, "head")
              .when(F.col("t") == 2, "middle")
              .otherwise("tail"))
    return (scored.withColumn("t", F.ntile(3).over(w))
            .withColumn("bucket", bucket)
            .groupBy("lang", "bucket")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.bround(F.avg("sb_logscore"), 4).alias("mean_sb_log10")))
