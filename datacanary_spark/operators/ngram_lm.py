"""Distributed word-n-gram language model with Stupid Backoff scoring.

The classic web-scale LM recipe (Brants et al. 2007, "Large Language
Models in Machine Translation"): train by counting n-grams with plain
MapReduce-style aggregation, score with the non-normalized Stupid
Backoff rule

    S(w_i | w_{i-k+1..i-1}) = count(k-gram) / count(context)   if seen
                            = alpha * S(w_i | shorter context)  otherwise

instead of a smoothed probability — at corpus scale the backoff constant
``alpha = 0.4`` matches Kneser-Ney quality at a fraction of the cost,
and crucially both training and scoring stay pure relational algebra:
count aggregations and equi-joins, no per-row Python anywhere.

This is the trainable companion to the fixed char-n-gram perplexity
model in ``functions/models.py`` (the reference repo — a single-process
pandas profiler, ``/root/reference/src/datacanary`` — has no LM at all;
this operator belongs to the LLM-data-pipeline surface, SURVEY.md §2):
CCNet-style quality filtering trains the LM on a trusted target corpus
and drops documents whose score under that model is poor.

Scale shape (10^12 docs):

* ``ngram_counts`` is ONE corpus pass for all orders (each gram tagged
  with its order doc-side, one explode, one (order, gram) hash
  aggregation) — map-side partial aggregation collapses hot grams
  before the shuffle, so the shuffle volume is the combined vocabulary
  of the orders, not the corpus.
  ``min_count`` pruning (standard for web-scale LMs) bounds the model:
  at n=5 over Common Crawl the pruned table is ~10^9 rows — a parquet
  "model table" (write it once, reuse across scoring runs; that is the
  resumability story, same as ``plans/incremental.py``'s signature
  store).
* ``score_stupid_backoff`` joins each scoring position against the
  count tables on the gram string: ``broadcast_model=True`` makes every
  join a broadcast hash join (right for pruned models up to ~a few GiB —
  they ship once per executor); otherwise the positions shuffle on the
  gram key, and all 2n-1 lookups against the same table reuse one
  exchange. No window functions: every per-position gram is built
  LINEARLY doc-side with slice+zip_with (``functions/heuristics.py``'s
  trigram trick generalized), so cost is O(words · n) per doc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datacanary_spark.functions.heuristics import ngrams_expr, words_expr
from datacanary_spark.plans.partitioning import spread_to_parallelism

__all__ = ["ALPHA", "ngrams_expr", "ngram_counts", "score_stupid_backoff",
           "oov_stats", "duplicate_span_stats"]

ALPHA = 0.4  # Brants et al. 2007 §4: a single unoptimized backoff factor


def ngram_counts(df: DataFrame, text_col: str = "text", n: int = 3,
                 min_count: int = 1) -> DataFrame:
    """Train: count every 1..n-gram of the corpus.

    Returns one model table ``(order int, gram string, c long)`` —
    write it to parquet to persist the model. ONE corpus pass for all
    orders (order-tagged grams, one explode, one (order, gram)
    aggregation — r06); ``min_count`` prunes each order's tail AFTER
    counting (counts stay exact for survivors). All orders are needed
    at scoring time: order j backs off to order j-1, and the context
    count of a j-gram lookup is an order-(j-1) row.

    The table also carries one ``(order=0, gram=NULL, c=N)`` row with
    the UNPRUNED corpus token count — the Brants f(w)/N unigram-floor
    denominator. It is exempt from ``min_count`` (pruning the model
    must not inflate floor scores; with the pruned survivors' sum as N,
    floor scores would silently grow with ``min_count`` and stop being
    comparable across pruning settings on the same corpus).
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    words = words_expr(F.col(text_col))
    # NOT spread: the heavy work here happens post-explode/post-shuffle
    # (the count aggregations), so a pre-explode exchange of the full
    # text only adds cost — measured 2.83s vs 3.59s at sf0.1
    live = df.where(F.col(text_col).isNotNull())
    # ONE corpus pass for every order (r06): tag each gram with its
    # order doc-side and explode the concatenated array once, then a
    # single (order, gram) hash aggregation. The previous shape ran a
    # separate explode+aggregate per order — n+1 full corpus scans for
    # one model build; tagging fuses them into one scan whose shuffle
    # carries the same gram bytes (the 4-byte order tag rides along).
    def _tag(k):
        # single-parameter lambda: a (g, i) signature would make
        # F.transform bind the second argument to the ARRAY INDEX
        return lambda g: F.struct(F.lit(k).alias("order"),
                                  g.alias("gram"))

    tagged = F.concat(*[F.transform(ngrams_expr(words, k), _tag(k))
                        for k in range(1, n + 1)])
    counted = (live.select(F.explode(tagged).alias("t"))
               .groupBy(F.col("t.order").alias("order"),
                        F.col("t.gram").alias("gram"))
               .agg(F.count(F.lit(1)).alias("c")))
    # corpus token count (order-0 row, min_count-exempt): the sum of
    # UNPRUNED unigram counts is exactly sum(size(words)) over live
    # docs — derived from the vocabulary-sized aggregate, not from
    # another corpus scan; coalesce covers the empty corpus.
    # the order-1 condition lives INSIDE the aggregate (sum(when)) —
    # a .where() would be pushed below counted's aggregation, making
    # the total branch's exchange differ from the main branch's and
    # defeating physical exchange reuse (the corpus would explode
    # twice; plan-verified)
    total = (counted.agg(F.coalesce(
                 F.sum(F.when(F.col("order") == 1, F.col("c"))),
                 F.lit(0)).cast("long").alias("c"))
             .select(F.lit(0).alias("order"),
                     F.lit(None).cast("string").alias("gram"), "c"))
    if min_count > 1:
        counted = counted.where(F.col("c") >= min_count)
    return total.unionByName(counted)


def _order_table(counts: DataFrame, k: int, broadcast: bool) -> DataFrame:
    t = counts.where(F.col("order") == k).select("gram", "c")
    return F.broadcast(t) if broadcast else t


def score_stupid_backoff(
    df: DataFrame,
    counts: DataFrame,
    id_cols: tuple[str, ...] = ("doc_id",),
    text_col: str = "text",
    n: int = 3,
    alpha: float = ALPHA,
    broadcast_model: bool = True,
    out_col: str = "sb_logscore",
    persist_model=True,
) -> DataFrame:
    """Score: mean log10 Stupid-Backoff score per document.

    Each scoring position i (positions n..word_count) carries, doc-side,
    the j-gram ENDING at i for every order j (the backoff chain) plus
    the (j-1)-gram context PREFIX of each — all slices of the same
    linear gram arrays, zipped into one struct array and exploded once.
    2n-1 left equi-joins against the model table resolve the counts;
    the score expression is one CASE over the chain:

        s = c_n/ctx_n                      if the n-gram was seen
          = alpha   * c_{n-1}/ctx_{n-1}    elif the (n-1)-gram was seen
          ...
          = alpha^{n-1} * coalesce(c_1, 1)/N     (unigram floor: unseen
            words score as count 1 — deterministic, and with a pruned
            model the floor also covers pruned-away tails; N is the
            UNPRUNED corpus token count from the model's order-0 row,
            per Brants' f(w)/N, so scores stay comparable across
            min_count settings)

    Both numerator and context guards are checked (with ``min_count``
    pruning a surviving j-gram's context row can be pruned). Documents
    with fewer than n words produce no scoring positions and are absent
    from the result (callers join back if they need them).

    Returns ``(*id_cols, out_col double, n_scored long)``.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    # The model table is referenced 2n (order tables + the order-0
    # totals row) times below; without a barrier Catalyst pushes each
    # reference's order filter below the count aggregation, so every
    # broadcast build re-derives the model from its source — when
    # ``counts`` is freshly trained that is 2n full corpus scans per
    # scoring run (measured: 20 scans in one ccnet_ppl plan at r05).
    # ``persist_model`` (tri-state: bool or plans.caching.CacheScope,
    # the repo-wide contract) marks the vocabulary-sized table for
    # caching: the first consumer computes it once, every later
    # reference planning-matches the cached relation (CacheManager
    # canonical-plan substitution) — unlike localCheckpoint this costs
    # no eager physical planning at build time (measured: checkpoint
    # added ~2.5s of plan work per call at sf0.1). With the bare
    # ``True`` default the blocks live until the caller unpersists or
    # the session ends — pass a CacheScope for a deterministic release
    # point, or False to re-derive per reference.
    from datacanary_spark.plans.caching import maybe_persist

    counts = maybe_persist(counts, persist_model)
    words = words_expr(F.col(text_col))
    # spread the scoring side (r06): tokenization + the gram-array
    # slices/zips below fuse into the scan stage, and a single-split
    # corpus file would serialize them onto one core. Docs move whole,
    # so each doc's position order — and hence its score's float
    # association — is unchanged (no-op at real scale).
    # No ``size(words) >= n`` row filter here: Catalyst pushes it below
    # the spread exchange with the tokenizer substituted in, which runs
    # the whole split+filter pass single-threaded at the scan (plan-
    # verified). Clamping ``out_len`` to 0 instead gives short docs
    # zero scoring positions — explode drops them, so the result set
    # (absent-when-under-n contract) is unchanged.
    base = (spread_to_parallelism(df.where(F.col(text_col).isNotNull()))
              .select(*id_cols, words.alias("_w")))
    wc = F.size(F.col("_w"))
    out_len = F.greatest(wc - (n - 1), F.lit(0))
    # for the n-gram ending at position i (i = n..wc, out_len of them):
    #   suffix j-gram  = element i-j+1 of the j-gram array
    #                  = slice(jgrams, n-j+1, out_len)
    #   prefix context = the (j-1)-gram ending at i-1
    #                  = element (i-1)-(j-1)+1 = i-j+1 of the (j-1)-array
    #                  = slice(j1grams, n-j+1, out_len)   (same offset)
    # bind each order's gram array ONCE as a named column (staged
    # project, the with_text_stats trick): order j-1's array feeds both
    # its own suffix slice g{j-1} and order j's context slice x{j} —
    # zip_with lambdas get fresh variable IDs per call, so rebuilding
    # the array per consumer would defeat Catalyst CSE and double the
    # per-document gram-construction work
    base = base.withColumns(
        {f"_a{j}": ngrams_expr(F.col("_w"), j) for j in range(1, n + 1)})
    fields = {}
    for j in range(1, n + 1):
        fields[f"g{j}"] = F.slice(F.col(f"_a{j}"), n - j + 1, out_len)
        if j > 1:
            fields[f"x{j}"] = F.slice(F.col(f"_a{j-1}"), n - j + 1, out_len)
    pos = base.select(
        *id_cols,
        F.explode(F.arrays_zip(
            *[v.alias(k) for k, v in fields.items()])).alias("p"))
    pos = pos.select(*id_cols,
                     *[F.col(f"p.{k}").alias(k) for k in fields])

    # unigram-floor denominator N: the UNPRUNED corpus token count that
    # ngram_counts stores as the (order=0, gram=NULL) row; model tables
    # written before that row existed fall back to the sum of surviving
    # order-1 counts (exact when the model was built with min_count=1).
    # 1-row frame, broadcast cross join (no collect).
    totals = counts.agg(
        F.max(F.when(F.col("order") == 0, F.col("c"))).alias("_t0"),
        F.sum(F.when(F.col("order") == 1, F.col("c"))).alias("_t1"),
    ).select(F.coalesce("_t0", "_t1").cast("double").alias("_N"))
    pos = pos.crossJoin(F.broadcast(totals))

    for j in range(1, n + 1):
        t = _order_table(counts, j, broadcast_model)
        pos = pos.join(t.withColumnRenamed("gram", f"g{j}")
                        .withColumnRenamed("c", f"c{j}"),
                       on=f"g{j}", how="left")
        if j > 1:
            t = _order_table(counts, j - 1, broadcast_model)
            pos = pos.join(t.withColumnRenamed("gram", f"x{j}")
                            .withColumnRenamed("c", f"cx{j}"),
                           on=f"x{j}", how="left")

    # backoff weights as driver-computed Python floats (alpha**k), not a
    # runtime pow() — Math.pow is only 1-ulp-accurate, and the DuckDB
    # oracle twin materializes the SAME repr() literals, so both engines
    # multiply by bit-identical doubles
    score = (F.lit(alpha ** (n - 1))
             * F.coalesce(F.col("c1"), F.lit(1)).cast("double")
             / F.col("_N"))
    for j in range(2, n + 1):
        seen = F.col(f"c{j}").isNotNull() & F.col(f"cx{j}").isNotNull()
        # association matches the oracle's left-to-right `a * c / ctx`:
        # (a * c) / ctx — a different grouping differs in the last bit
        w = F.col(f"c{j}").cast("double")
        if j < n:
            w = F.lit(alpha ** (n - j)) * w
        w = w / F.col(f"cx{j}")
        score = F.when(seen, w).otherwise(score)

    return (pos.select(*id_cols, F.log10(score).alias("_ls"))
               .groupBy(*id_cols)
               .agg(F.avg("_ls").alias(out_col),
                    F.count(F.lit(1)).alias("n_scored")))


def oov_stats(df: DataFrame, group_col: str = "lang",
              text_col: str = "text", id_col: str = "doc_id",
              min_count: int = 5, broadcast_vocab: bool = True) -> DataFrame:
    """Per-group out-of-vocabulary rate under a frequency-thresholded
    vocabulary (the classic LM-side quality signal: a document whose
    tokens are mostly outside the corpus vocabulary is boilerplate,
    encoding noise, or the wrong language).

    The vocabulary is per group: tokens seen ``>= min_count`` times
    within the group — a count threshold rather than a top-k so
    membership is deterministic without tie-breaking, and so the build
    is one aggregation (no global sort). Per doc, the OOV fraction is
    the share of token POSITIONS (not distinct tokens) outside the
    vocabulary; per group the mean of doc fractions.

    Scale: the vocab frame is an aggregated (group, token) table —
    broadcast when pruned small, else the join shuffles on the token.
    Null-safe on the group key: a null group is still a group (same
    contract as ``cap_per_group`` / ``mad_approx``).

    Returns ``(group_col, n_docs long, mean_oov_frac double)``.
    """
    words = words_expr(F.col(text_col))
    toks = (df.where(F.col(text_col).isNotNull())
              .select(id_col, group_col, F.explode(words).alias("w")))
    vocab = (toks.groupBy(group_col, "w")
                 .agg(F.count(F.lit(1)).alias("c"))
                 .where(F.col("c") >= min_count)
                 .select(F.col(group_col).alias("_g"),
                         F.col("w").alias("_vw"),
                         F.lit(1).alias("_in")))
    joined = toks.join(
        F.broadcast(vocab) if broadcast_vocab else vocab,
        F.col(group_col).eqNullSafe(F.col("_g")) & (F.col("w") == F.col("_vw")),
        "left")
    per_doc = (joined.groupBy(id_col, group_col)
               .agg(F.avg(F.when(F.col("_in").isNull(), 1.0)
                          .otherwise(0.0)).alias("_oov")))
    return (per_doc.groupBy(group_col)
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.avg("_oov").alias("mean_oov_frac")))


def duplicate_span_stats(df: DataFrame, group_col: str = "lang",
                         text_col: str = "text", id_col: str = "doc_id",
                         k: int = 5) -> DataFrame:
    """Cross-document duplicated-span fraction (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better",
    re-expressed relationally): a k-token span is *duplicated* when the
    identical span occurs in >= 2 distinct documents; per document, the
    fraction of k-gram positions covered by a duplicated span; per
    group, the mean fraction and how many docs contain any.

    This is the MEASUREMENT twin of ``dedup.remove_repeated_ngrams``
    (which rewrites text, keeping each repeated window's canonical
    first occurrence): run this first to decide whether span dedup is
    worth a rewrite pass, and after to verify the rewrite converged.

    Plan: one explode to (md5(k-gram), doc) rows, then ONE full-volume
    shuffle — an explicit repartition on the span hash. Everything
    after it is co-partitioned on ``h`` and runs without another
    Exchange over the positions: the per-(span, doc) position count
    (hash-partitioning on ``h`` already clusters ``(h, doc)``), the
    docs-per-span count, and the verdict join all reuse the same
    layout; only the tiny per-doc rows shuffle again for the final
    aggregations. Never a doc×doc comparison.
    (``winnow_overlap_pairs`` answers the *pairwise* version of this
    question from sampled fingerprints; this is the per-corpus
    coverage metric over ALL spans.)

    Hash note: md5 collisions (2^-128) can only over-count duplication
    by a hair; the 16-byte fixed key is what makes the shuffle cheap at
    10^12 spans — the exact-span variant just drops the md5.

    Returns ``(group_col, n_docs long, mean_dup_frac double,
    docs_with_dup long)``.
    """
    words = words_expr(F.col(text_col))
    spans = (spread_to_parallelism(df.where(F.col(text_col).isNotNull()))
               .select(id_col, group_col,
                       F.explode(ngrams_expr(words, k)).alias("_s"))
               .select(id_col, group_col, F.md5(F.col("_s")).alias("h"))
               .repartition(F.col("h")))
    # (h, doc) rows with per-doc position counts — partitioning on h
    # satisfies the (h, doc) clustering, so no new Exchange
    per_sd = (spans.groupBy("h", id_col, group_col)
                   .agg(F.count(F.lit(1)).alias("_npos")))
    span_docs = per_sd.groupBy("h").agg(F.count(F.lit(1)).alias("nd"))
    marked = per_sd.join(span_docs, "h")
    dup_pos = F.when(F.col("nd") >= 2, F.col("_npos")).otherwise(F.lit(0))
    per_doc = (marked.groupBy(id_col, group_col)
               .agg((F.sum(dup_pos).cast("double")
                     / F.sum("_npos")).alias("_frac")))
    return (per_doc.groupBy(group_col)
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.avg("_frac").alias("mean_dup_frac"),
                 F.sum(F.when(F.col("_frac") > 0, 1).otherwise(0))
                  .cast("long").alias("docs_with_dup")))
