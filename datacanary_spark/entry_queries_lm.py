"""Driver-contract queries: distributed n-gram LM (Stupid Backoff),
OOV-rate vocabulary coverage, and cross-document duplicated-span
fraction (operators/ngram_lm.py).

Registered into datacanary_spark.entry_queries.{QUERIES,ORACLE_SQL}.
Backoff-weight literals are materialized into BOTH sides from the same
Python float (``repr(ALPHA**k)``) so neither engine calls ``pow`` at
runtime — Math.pow / libm pow are only 1-ulp-accurate and a last-bit
disagreement would poison the value hash.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datacanary_spark.entry_queries import _TOKS, _t, register
from datacanary_spark.operators import ngram_lm as nl

_A1 = repr(nl.ALPHA)          # 0.4
_A2 = repr(nl.ALPHA ** 2)     # 0.16000000000000003 (exact double of 0.4**2)
_OOV_MIN_COUNT = 5            # one constant, interpolated into BOTH twins

# Trigram Stupid-Backoff self-scoring over the _TOKS positions, ending
# in per_doc(doc_id, lang, ds = mean log10 score, np = positions).
# Shared verbatim by sb_trigram_logscore_by_lang (here) and
# ccnet_ppl_buckets_by_lang (entry_queries_tokenizer) so a fix to the
# backoff CASE or the per-doc aggregation can never diverge the two.
_SB_SCORE_CTES = f"""
    tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM toks),
    uni AS (SELECT w, count(*) AS c FROM toks GROUP BY 1),
    bi AS (
      SELECT a.w || ' ' || b.w AS g, count(*) AS c
      FROM toks a JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
      GROUP BY 1
    ),
    tri AS (
      SELECT a.w || ' ' || b.w || ' ' || c2.w AS g, count(*) AS c
      FROM toks a
      JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
      JOIN toks c2 ON c2.doc_id = a.doc_id AND c2.pos = a.pos + 2
      GROUP BY 1
    ),
    pos AS (
      SELECT a.doc_id, a.lang, a.w AS w1, b.w AS w2, c2.w AS w3
      FROM toks a
      JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
      JOIN toks c2 ON c2.doc_id = a.doc_id AND c2.pos = a.pos + 2
    ),
    sc AS (
      SELECT p.doc_id, p.lang,
        CASE
          WHEN t3.c IS NOT NULL AND bx.c IS NOT NULL
            THEN CAST(t3.c AS DOUBLE) / bx.c
          WHEN b2.c IS NOT NULL AND ux.c IS NOT NULL
            THEN {_A1} * CAST(b2.c AS DOUBLE) / ux.c
          ELSE {_A2} * CAST(coalesce(u3.c, 1) AS DOUBLE) / tot.n
        END AS s
      FROM pos p
      LEFT JOIN tri t3 ON t3.g = p.w1 || ' ' || p.w2 || ' ' || p.w3
      LEFT JOIN bi bx ON bx.g = p.w1 || ' ' || p.w2
      LEFT JOIN bi b2 ON b2.g = p.w2 || ' ' || p.w3
      LEFT JOIN uni ux ON ux.w = p.w2
      LEFT JOIN uni u3 ON u3.w = p.w3
      CROSS JOIN tot
    ),
    per_doc AS (
      SELECT doc_id, lang, avg(log10(s)) AS ds, count(*) AS np
      FROM sc GROUP BY 1, 2
    )
"""


@register(
    "sb_trigram_logscore_by_lang",
    f"""
    WITH {_TOKS},
    {_SB_SCORE_CTES}
    SELECT lang, count(*) AS n_docs,
           round(avg(ds), 4) AS mean_sb_log10,
           CAST(sum(np) AS BIGINT) AS n_positions
    FROM per_doc GROUP BY lang
    """,
)
def sb_trigram_logscore_by_lang(spark, sf_dir):
    """Train a trigram Stupid-Backoff LM on the corpus (three count
    aggregations) and score every document under it (2n-1 broadcast
    lookups against the model table), CCNet-style self-scoring: per
    language, the mean per-doc log10 score. Counting + joining only —
    the LM is pure relational algebra, which is exactly why Brants-style
    LMs were the first to reach web scale."""
    d = _t(spark, sf_dir, "documents")
    counts = nl.ngram_counts(d, n=3)
    scored = nl.score_stupid_backoff(
        d, counts, id_cols=("doc_id", "lang"), n=3)
    return scored.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.bround(F.avg("sb_logscore"), 4).alias("mean_sb_log10"),
        F.sum("n_scored").alias("n_positions"))


@register(
    "oov_rate_by_lang",
    f"""
    WITH {_TOKS},
    vocab AS (
      SELECT lang, w FROM toks GROUP BY lang, w
      HAVING count(*) >= {_OOV_MIN_COUNT}
    ),
    j AS (
      SELECT t.doc_id, t.lang,
             CASE WHEN v.w IS NULL THEN 1.0 ELSE 0.0 END AS oov
      FROM toks t
      LEFT JOIN vocab v
        ON t.lang IS NOT DISTINCT FROM v.lang AND t.w = v.w
    ),
    per_doc AS (SELECT doc_id, lang, avg(oov) AS f FROM j GROUP BY 1, 2)
    SELECT lang, count(*) AS n_docs, round(avg(f), 4) AS mean_oov_frac
    FROM per_doc GROUP BY lang
    """,
)
def oov_rate_by_lang(spark, sf_dir):
    """Per-language out-of-vocabulary rate under a frequency-thresholded
    per-language vocabulary: mean over docs of the fraction of token
    positions outside the vocabulary. The LM-side junk detector: high
    OOV means boilerplate, encoding noise, or misrouted language."""
    d = _t(spark, sf_dir, "documents")
    s = nl.oov_stats(d, min_count=_OOV_MIN_COUNT)
    return s.select("lang", "n_docs",
                    F.bround("mean_oov_frac", 4).alias("mean_oov_frac"))


@register(
    "dup_span_fraction_by_lang",
    f"""
    WITH {_TOKS},
    spans AS (
      SELECT a.doc_id, a.lang,
             md5(a.w || ' ' || b.w || ' ' || c2.w || ' ' || d.w || ' ' || e.w)
               AS h
      FROM toks a
      JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
      JOIN toks c2 ON c2.doc_id = a.doc_id AND c2.pos = a.pos + 2
      JOIN toks d ON d.doc_id = a.doc_id AND d.pos = a.pos + 3
      JOIN toks e ON e.doc_id = a.doc_id AND e.pos = a.pos + 4
    ),
    span_docs AS (
      SELECT h, count(*) AS nd
      FROM (SELECT DISTINCT h, doc_id FROM spans) GROUP BY h
    ),
    marked AS (
      SELECT s.doc_id, s.lang,
             CASE WHEN sd.nd >= 2 THEN 1.0 ELSE 0.0 END AS dup
      FROM spans s JOIN span_docs sd USING (h)
    ),
    per_doc AS (SELECT doc_id, lang, avg(dup) AS f FROM marked GROUP BY 1, 2)
    SELECT lang, count(*) AS n_docs,
           round(avg(f), 4) AS mean_dup_frac,
           CAST(sum(CASE WHEN f > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS docs_with_dup
    FROM per_doc GROUP BY lang
    """,
)
def dup_span_fraction_by_lang(spark, sf_dir):
    """Lee-et-al-style duplicated-span coverage: per language, the mean
    fraction of 5-token spans that also occur in another document, and
    how many docs contain any such span. Two shuffles on the md5 span
    key; never doc×doc."""
    d = _t(spark, sf_dir, "documents")
    s = nl.duplicate_span_stats(d, k=5)
    return s.select("lang", "n_docs",
                    F.bround("mean_dup_frac", 4).alias("mean_dup_frac"),
                    "docs_with_dup")
