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


def cap_per_group(df: DataFrame, group_col: str, cap: int, key_col: str,
                  salt: str = "hostcap", prefilter: bool = False,
                  oversample: float = 4.0,
                  exempt_null_group: bool = False) -> DataFrame:
    """Keep at most ``cap`` rows per group, chosen deterministically by
    hash order — the anti-spam HOST CAP of web pipelines (C4/Gopher cap
    documents per host so link farms can't dominate the corpus).

    Selection: rows ranked by (md5 bucket, key) within each group; the
    ``cap`` smallest survive. A pure function of the keys → identical
    output on any engine, partitioning, or cluster size, and re-runs of
    a resumable job pick the same survivors. PRECONDITION: ``key_col``
    must be unique within each group (it is the only tie-breaker — two
    rows sharing a key have identical sort keys, and which one's OTHER
    columns survive at the cap boundary would be partition-order luck).
    In the pipeline the key is the url, unique after exact dedup; cap
    BEFORE deduplicating only if the key is still an identity.

    Scale shape: the rank is a per-group window — fine when groups are
    hosts (≤10^6 rows each). For PATHOLOGICAL groups (a single host
    with 10^9 pages funneling one window partition),
    ``prefilter=True`` first drops rows whose hash bucket exceeds
    ~``oversample·cap/n_g`` of the hash space (per-group counts via one
    aggregate whose map-side partials absorb the hot key), so the
    window only ranks ~oversample·cap survivors per group. The
    survivors' ranks equal their global ranks (the hash filter keeps a
    PREFIX of the hash order), so results are identical to the plain
    window **provided ≥ cap rows survive** — P(shortfall) < 10⁻⁹ at
    oversample=4, cap ≥ 50 (Chernoff); the exact window form is the
    oracle twin.

    ``exempt_null_group=True`` passes NULL-keyed rows through uncapped:
    a NULL group key usually means "key could not be derived" (e.g. an
    unparseable URL yields a NULL host), and those rows are distinct
    documents, not one spam host — capping them as a single pseudo-group
    would silently delete them. Default stays False (cap every group,
    NULL included) because the exact/oracle twin semantics treat NULL
    as a real group.
    """
    if exempt_null_group:
        capped = cap_per_group(
            df.where(F.col(group_col).isNotNull()), group_col, cap,
            key_col, salt=salt, prefilter=prefilter, oversample=oversample)
        return capped.unionByName(df.where(F.col(group_col).isNull()))
    bucket = _bucket_expr(F.col(key_col), salt)
    d = df
    if prefilter:
        counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
        frac = F.least(F.lit(1.0), F.lit(float(oversample * cap)) / F.col("_n"))
        # per-group threshold: same hex-space prefix rule as sampling
        # F.conv emits UPPERCASE hex; md5 hex is lowercase — lower()
        # or the lexicographic compare silently drops every row
        thr = F.lpad(F.lower(F.conv(
            (frac * F.lit(float(16 ** 8))).cast("long").cast("string"),
            10, 16)), 8, "0")
        thr = F.when(frac >= 1.0, F.lit("g")).otherwise(thr)
        # null-SAFE join: groupBy emits a row for the null group and
        # the window path ranks it like any other — an equality join
        # here would silently drop every null-group row, diverging
        # from the exact form this path must match
        c = counts.select(F.col(group_col).alias("_g"), thr.alias("_thr"))
        d = (df.join(c, F.col(group_col).eqNullSafe(F.col("_g")))
               .where(bucket < F.col("_thr")).drop("_g", "_thr"))
    w = Window.partitionBy(group_col).orderBy(bucket.asc(),
                                              F.col(key_col).asc())
    return (d.withColumn("_rank", F.row_number().over(w))
             .where(F.col("_rank") <= cap).drop("_rank"))


def distributed_cumsum(df: DataFrame, order_col: str, value_col: str,
                       out_col: str = "cum",
                       n_parts: int | None = None) -> DataFrame:
    """Global running total of ``value_col`` in ``order_col`` order —
    WITHOUT the single-partition window a bare
    ``Window.orderBy(order_col)`` plans (every row through one task: a
    non-starter at 10^12 rows).

    Classic two-pass distributed prefix sum over DETERMINISTIC buckets:

    1. bucket each row by an explicit id-range rule (bucket =
       ``(id − min) // width``, width from one tiny min/max aggregate)
       — NOT ``repartitionByRange``, whose sampled boundaries can
       differ between the offsets job and the final job and would
       silently misalign the offsets; per-bucket local cumsum via a
       window partitioned by the bucket;
    2. the P per-bucket totals (P rows, not data rows) come to the
       driver, and the running offsets go back as a broadcast join
       against the tiny offsets frame — one narrow map adds them.

    Each row's result is the sum over all preceding order keys —
    identical to the serial form and to a SQL oracle's ``sum() OVER
    (ORDER BY …)``, including the null contract (the running sum is
    NULL until the first non-null value, then nulls are skipped) and
    negative values (totals are per-bucket SUMs, never running maxes).
    ``order_col`` must be unique (it is a doc id); ties would make
    "preceding" ambiguous. Bucket balance tracks id density (dense ids
    → even buckets; pathological sparsity just skews bucket sizes,
    never correctness).
    """
    n_parts = n_parts or df.sparkSession.sparkContext.defaultParallelism
    lo, hi = df.agg(F.min(order_col), F.max(order_col)).first()
    if lo is None:
        return df.withColumn(out_col, F.lit(None).cast("long"))
    width = max((int(hi) - int(lo)) // n_parts + 1, 1)
    bucket = ((F.col(order_col) - F.lit(int(lo))) / F.lit(width)) \
        .cast("long")
    d = df.withColumn("_pid", bucket)
    w = Window.partitionBy("_pid").orderBy(order_col)
    # running sum AND running non-null count per bucket: the serial
    # window sum is NULL until the first non-null value, and the
    # distributed form must reproduce that exactly
    local = d.withColumn("_local", F.sum(value_col).over(w)) \
             .withColumn("_lcnt", F.count(value_col).over(w))
    # P tiny rows to the driver — the legitimate kind of collect.
    # Totals come from SUM over the bucket (a running MAX would be
    # wrong the moment value_col goes negative).
    totals = sorted(
        d.groupBy("_pid").agg(F.sum(value_col).alias("_t"),
                              F.count(value_col).alias("_c")).collect(),
        key=lambda r: r["_pid"])
    off_rows, run_sum, run_cnt = [], 0, 0
    for r in totals:
        off_rows.append((int(r["_pid"]), run_sum, run_cnt))
        run_sum += int(r["_t"] or 0)
        run_cnt += int(r["_c"])
    # offsets go back as a BROADCAST join against the P-row frame —
    # O(1) expression depth (a per-pid CASE chain would be O(P) deep
    # and overflow Catalyst/codegen at cluster partition counts)
    offsets = df.sparkSession.createDataFrame(
        off_rows, "_pid: long, _off: long, _pcnt: long")
    joined = local.join(F.broadcast(offsets), "_pid")
    cum = F.when(F.col("_lcnt") + F.col("_pcnt") == 0,
                 F.lit(None).cast("long")) \
           .otherwise((F.coalesce(F.col("_local"), F.lit(0))
                       + F.col("_off")).cast("long"))
    return (joined.withColumn(out_col, cum)
                  .drop("_pid", "_local", "_lcnt", "_off", "_pcnt"))


def assign_token_shards(df: DataFrame, shard_tokens: int,
                        id_col: str = "doc_id", text_col: str = "text",
                        out_col: str = "shard") -> DataFrame:
    """Deterministic token-budget sharding: docs in id order are packed
    greedily into shards of ~``shard_tokens`` whitespace tokens — the
    "write the corpus as N-token output files" step before tokenizer
    runs. ``shard = floor((cumsum_tokens − tokens) / shard_tokens)``:
    a doc starts a new shard when the budget is exhausted; shard ids
    start at 0 and are monotone non-decreasing in doc order, but NOT
    necessarily dense — a single doc larger than the budget advances
    the cumulative count past whole shard ids (writers keyed on shard
    id must iterate the ids PRESENT, not ``range(max+1)``). The
    assignment is a pure function of the corpus (re-runs and engines
    agree). Null text counts 0 tokens and stays in the stream (its
    shard is still defined).

    Built on :func:`distributed_cumsum` — no single-partition window.
    """
    from datacanary_spark.operators.text_analysis import token_count_ws

    toks = df.withColumn(
        "_tok", F.coalesce(token_count_ws(F.col(text_col)), F.lit(0)))
    cum = distributed_cumsum(toks, id_col, "_tok", out_col="_cum")
    return (cum.withColumn(
                out_col,
                F.floor((F.col("_cum") - F.col("_tok")) /
                        F.lit(shard_tokens)).cast("int"))
               .drop("_tok", "_cum"))


def pack_sequences(df: DataFrame, seq_len: int,
                   id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Concat-and-chunk sequence packing: the corpus's token stream in
    ``id_col`` order is cut into fixed ``seq_len``-token training
    windows (the GPT-style pretraining layout — no padding, docs may
    straddle window boundaries). Adds per-doc packing facts:

    - ``first_seq`` — window holding the doc's first token
      (``floor(tokens_before / seq_len)``),
    - ``last_seq`` — window holding its last token
      (``floor((tokens_through − 1) / seq_len)``; empty docs occupy no
      tokens, so ``last_seq = first_seq``),
    - ``n_splits`` — how many window boundaries cut the doc
      (``last_seq − first_seq``; the count of attention-mask breaks /
      cross-doc leakage points this doc suffers).

    The assignment is a pure function of the corpus — re-runs, engines
    and a serial oracle agree. Token counts are whitespace tokens
    (:func:`~datacanary_spark.operators.text_analysis.token_count_ws`);
    null text counts 0 and stays in the stream. The running total is
    :func:`distributed_cumsum` (deterministic id-range buckets +
    per-bucket window + broadcast offsets) — never a single-partition
    global window, so the op survives 10^12 rows.
    """
    from datacanary_spark.operators.text_analysis import token_count_ws

    toks = df.withColumn(
        "_tok", F.coalesce(token_count_ws(F.col(text_col)), F.lit(0)))
    cum = distributed_cumsum(toks, id_col, "_tok", out_col="_cum")
    first = F.floor((F.col("_cum") - F.col("_tok")) / F.lit(seq_len)) \
        .cast("long")
    last = F.when(F.col("_tok") > 0,
                  F.floor((F.col("_cum") - 1) / F.lit(seq_len))
                   .cast("long")) \
            .otherwise(first)
    return (cum.withColumn("first_seq", first)
               .withColumn("last_seq", last)
               .withColumn("n_splits", F.col("last_seq") - F.col("first_seq"))
               .drop("_tok", "_cum"))


def approx_quantile_buckets(df: DataFrame, value_col: str,
                            group_col: str, n_buckets: int = 10,
                            accuracy: int = 10000,
                            out_col: str = "bucket") -> DataFrame:
    """Per-group quantile bucketing with BOUNDED state — the 10^12-row
    companion to the ntile() decile query (whose window ranks every row
    of a group in one partition: fine at test scale, a hot-partition
    funnel at corpus scale).

    One ``percentile_approx`` sketch per group (O(accuracy) state)
    yields the n_buckets−1 boundaries; a join brings them back and the
    bucket is ``1 + #boundaries ≤ value`` — a narrow map, no window
    anywhere. Semantics note: this is VALUE-quantile bucketing (equal
    values land in one bucket) where ntile is row-balanced (ties can
    straddle buckets); at corpus scale the value semantic is the one
    you want for "which length band is this doc in". Null values get a
    null bucket.
    """
    probs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = df.groupBy(group_col).agg(
        F.percentile_approx(value_col, probs, accuracy).alias("_bounds")) \
        .select(F.col(group_col).alias("_g"), "_bounds")
    v = F.col(value_col).cast("double")
    bucket = F.lit(1) + F.aggregate(
        F.col("_bounds"), F.lit(0),
        lambda acc, b: acc + F.when(v >= b, 1).otherwise(0))
    # null-SAFE join: a null group has its own sketch row and its rows
    # must be bucketed like the window twin buckets them — an equality
    # join would silently delete every null-group doc
    return (df.join(bounds, F.col(group_col).eqNullSafe(F.col("_g")))
              .withColumn(out_col,
                          F.when(v.isNull(),
                                 F.lit(None).cast("int"))
                           .otherwise(bucket.cast("int")))
              .drop("_g", "_bounds"))


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


def temperature_fractions(df: DataFrame, strata_col: str,
                          alpha: float = 0.5,
                          weight_col: str | None = None) -> dict[str, float]:
    """Per-stratum keep fractions for temperature-based corpus mixing
    (mT5/XLM-R style): effective mass becomes proportional to
    ``n^alpha``, flattening the head of a skewed language/source
    distribution without upsampling.

    fraction_s = (n_s / n_min) ** (alpha - 1) — normalized so the
    SMALLEST stratum keeps 100% (subsampling can only remove docs);
    alpha=1 keeps everything, alpha=0 equalizes effective mass.
    ``weight_col`` switches the mass from document count to a column
    sum (e.g. token counts — real mixing recipes usually rebalance by
    token mass, not documents; null weights count as 0). NULL strata
    are excluded (they take ``hash_stratified_sample``'s
    ``default_fraction``). Driver-side math over one tiny aggregate
    (#strata rows) — the heavy filtering stays in
    :func:`hash_stratified_sample`'s narrow plan-literal predicate.
    """
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1]: {alpha}")
    mass = (F.count(F.lit(1)) if weight_col is None
            else F.sum(F.coalesce(F.col(weight_col).cast("double"),
                                  F.lit(0.0))))
    counts = {r[strata_col]: r["n"]
              for r in df.where(F.col(strata_col).isNotNull())
                         .groupBy(strata_col)
                         .agg(mass.alias("n")).collect()}
    counts = {s: n for s, n in counts.items() if n and n > 0}
    if not counts:
        return {}
    n_min = min(counts.values())
    return {s: float((n / n_min) ** (alpha - 1.0))
            for s, n in counts.items()}


def temperature_sample(df: DataFrame, strata_col: str, key_col: str,
                       alpha: float = 0.5, salt: str = "sample",
                       weight_col: str | None = None) -> DataFrame:
    """Temperature-rebalanced deterministic sample: compose
    :func:`temperature_fractions` with :func:`hash_stratified_sample`.
    Membership stays a pure function of (salt, key), so the identical
    rebalanced corpus falls out on any cluster size or engine."""
    fractions = temperature_fractions(df, strata_col, alpha, weight_col)
    return hash_stratified_sample(df, strata_col, fractions, key_col,
                                  salt=salt)


def ccnet_buckets(df: DataFrame, value_col: str, group_col: str,
                  cuts: tuple[float, ...] = (1.0 / 3.0, 2.0 / 3.0),
                  labels: tuple[str, ...] = ("head", "middle", "tail"),
                  exact: bool = True, accuracy: int = 10000,
                  out_col: str = "bucket") -> DataFrame:
    """CCNet-style per-group quantile banding (Wenzek et al. 2020):
    split each language's documents into named bands — canonically
    head/middle/tail at the per-language perplexity terciles, where
    "head" (lowest perplexity) feeds training first and "tail" is
    dropped or downweighted.

    Same plan shape as :func:`approx_quantile_buckets` (per-group
    cutoff aggregate → broadcastable join back → one CASE per row; no
    window, nothing per-row in Python): ``exact=True`` uses
    ``percentile`` — unbounded per-group state, but the (n−1)·p
    linear-interpolation rule is shared bit-for-bit with DuckDB's
    ``quantile_cont``, making this the oracle mode; ``exact=False``
    swaps in the ``percentile_approx`` sketch (O(accuracy) state per
    group) for the 10^12-row pass, identical downstream plan.

    Banding rule: value ≤ cut₁ → labels[0], ≤ cut₂ → labels[1], …,
    else labels[-1]; null values → null band; the null GROUP keeps its
    own cutoffs (eqNullSafe join, as everywhere in this module).
    """
    if len(labels) != len(cuts) + 1:
        raise ValueError(f"need len(labels) == len(cuts)+1, got "
                         f"{len(labels)} labels / {len(cuts)} cuts")
    pfn = F.percentile if exact else (
        lambda c, p: F.percentile_approx(c, p, accuracy))
    bounds = df.groupBy(group_col).agg(
        pfn(F.col(value_col).cast("double"), F.lit(list(cuts)))
        .alias("_cuts")) \
        .select(F.col(group_col).alias("_g"), "_cuts")
    v = F.col(value_col).cast("double")
    band = F.lit(labels[-1])
    for i in range(len(cuts) - 1, -1, -1):
        band = F.when(v <= F.element_at("_cuts", i + 1), F.lit(labels[i])) \
                .otherwise(band)
    return (df.join(bounds, F.col(group_col).eqNullSafe(F.col("_g")))
              .withColumn(out_col,
                          F.when(v.isNull(), F.lit(None).cast("string"))
                           .otherwise(band))
              .drop("_g", "_cuts"))


def tfidf_top_terms(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", k: int = 3,
                    min_df: int = 1) -> DataFrame:
    """Top-k TF-IDF terms per document — the keyword-extraction
    primitive (doc summarization, near-dup explanations, index keys).

    score(t, d) = tf(t, d) · ln(N / df(t)), natural log, raw counts —
    the classic formulation, chosen because every factor is an integer
    until the final ln/multiply, so the DuckDB oracle reproduces it
    bit-for-bit (same discipline as DSIR's ln-ratio model).

    Plan: explode words → (id, term) count [shuffle 1, map-side
    partials] → term document frequencies from the SAME aggregate
    [shuffle 2 over |vocab| rows, not corpus rows] → join df back
    [broadcastable: vocabulary is Heaps-law sublinear] → corpus size N
    as a single-row scalar broadcast cross join (never collect) →
    per-doc top-k window over each doc's OWN vocabulary (bounded by
    doc length, no hot partition). ``min_df`` prunes hapax noise
    before the join. Tie-break: score desc, term asc.
    """
    tf = (df.select(F.col(id_col),
                    F.explode(words_expr(F.col(text_col))).alias("term"))
            .groupBy(id_col, "term")
            .agg(F.count(F.lit(1)).alias("tf")))
    dfreq = (tf.groupBy("term")
               .agg(F.count(F.lit(1)).alias("df"))
               .where(F.col("df") >= min_df))
    n_docs = df.select(
        F.count(F.lit(1)).cast("double").alias("_n"))
    scored = (tf.join(dfreq, "term")
                .crossJoin(F.broadcast(n_docs))
                .withColumn("score",
                            F.col("tf").cast("double")
                            * F.log(F.col("_n") / F.col("df")))
                .drop("_n"))
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(),
                                           F.col("term").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


def host_reputation(df: DataFrame, url_col: str = "url",
                    quality_col: str | None = None,
                    text_col: str = "text",
                    min_docs: int = 1,
                    approx: bool = False) -> DataFrame:
    """Per-host reputation aggregates — the table a crawl scheduler or
    domain-level filter consumes: doc count, distinct-content ratio
    (1 − duplicate fraction by normalized fingerprint), mean document
    length, and mean quality score when a score column exists.

    One groupBy on the parsed host (same extraction rule as the
    blocklist — lowercased, port stripped; null hosts are excluded:
    a reputation for "unknown origin" would be meaningless and its
    group unboundedly hot). ``approx=True`` swaps the distinct-content
    count to approx_count_distinct (HLL++, O(1) state per host — the
    10^12-doc mode); the exact count_distinct default is the oracle
    form. Map-side partials make the shuffle O(hosts).
    """
    from datacanary_spark.operators.text_analysis import (
        blocklist_host_expr,
        content_fingerprint,
    )

    host = blocklist_host_expr(F.col(url_col))
    base = (df.withColumn("_host", host)
              .where(F.col("_host").isNotNull())
              .withColumn("_fp", content_fingerprint(F.col(text_col))))
    # null fingerprints (null text) are exempt identities: each failed
    # extraction is ITS OWN content, not a duplicate of the others
    # (content_fingerprint contract) — count_distinct skips nulls, so
    # without the correction a host of 10 null-text docs would score
    # distinct_ratio 0.0 and read as 100% duplicated
    distinct = (F.approx_count_distinct(F.col("_fp")) if approx
                else F.count_distinct(F.col("_fp")))
    distinct = distinct + F.sum(F.col("_fp").isNull().cast("long"))
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        distinct.alias("n_distinct"),
        F.bround(F.avg(F.length(F.col(text_col)).cast("double")), 6)
        .alias("mean_chars"),
    ]
    if quality_col is not None:
        aggs.append(F.bround(F.avg(F.col(quality_col).cast("double")), 6)
                    .alias("mean_quality"))
    out = (base.groupBy(F.col("_host").alias("host")).agg(*aggs)
               .where(F.col("n_docs") >= min_docs))
    return out.withColumn(
        "distinct_ratio",
        F.bround(F.col("n_distinct").cast("double")
                 / F.col("n_docs").cast("double"), 6))


def epoch_upsample(df: DataFrame, strata_col: str,
                   weights: dict[str, float], key_col: str,
                   default_weight: float = 1.0,
                   epoch_col: str = "epoch",
                   salt: str = "upsample") -> DataFrame:
    """Mixture upsampling: replicate each stratum's docs to a target
    epoch weight — the OTHER half of corpus mixing. hash_stratified_
    sample / temperature_sample can only keep fractions ≤ 1; training
    mixtures (LLaMA-style: Wikipedia 2.45 epochs, Books 2.23, web 1.0)
    need docs REPEATED a fractional number of times.

    A doc in a stratum with weight ``w`` appears ``floor(w)`` times,
    plus once more iff the sampler's hash bucket of its key falls
    below ``w − floor(w)`` — the SAME md5 bucket rule as every other
    sampling entry point (`_bucket_expr`), so the replica set is a
    pure function of content: identical on any partitioning, cluster
    size, or engine, and E[copies] = w exactly. Copies carry
    ``epoch_col`` = 0..n−1 so downstream packing/sharding can
    interleave epochs instead of emitting them back-to-back.

    Plan: one narrow projection (literal weight CASE + hash compare)
    → explode(sequence(0, n_copies−1)) — no shuffle, no join; output
    rows ≈ Σ w_s·|stratum|. Weight 0 drops the stratum (explode of an
    empty sequence); strata not listed get ``default_weight``. Null
    strata take the default too (an unknown stratum is not evidence
    the doc should vanish).
    """
    for s, w in weights.items():
        if w < 0:
            raise ValueError(f"negative weight for {s!r}: {w}")
    if default_weight < 0:
        raise ValueError(f"negative default_weight: {default_weight}")

    def n_copies_expr(w: float) -> Column:
        base = int(w)
        frac = w - base
        extra = (F.lit(1).cast("int")
                 if frac >= 1.0 else
                 (F.lit(0).cast("int") if frac <= 0.0 else
                  (_bucket_expr(F.col(key_col), salt)
                   < F.lit(_hex_threshold(frac))).cast("int")))
        return F.lit(base) + extra

    copies = None
    for s, w in weights.items():
        cond = F.col(strata_col).eqNullSafe(F.lit(s))
        copies = (F.when(cond, n_copies_expr(w)) if copies is None
                  else copies.when(cond, n_copies_expr(w)))
    copies = (copies.otherwise(n_copies_expr(default_weight))
              if copies is not None else n_copies_expr(default_weight))
    return (df.withColumn("_n", copies)
              .where(F.col("_n") > 0)
              .withColumn(epoch_col,
                          F.explode(F.sequence(F.lit(0), F.col("_n") - 1)))
              .drop("_n"))


def zipf_slope(df: DataFrame, group_col: str = "lang",
               text_col: str = "text", min_count: int = 2,
               max_rank: int = 10000) -> DataFrame:
    """Per-group Zipf rank-frequency slope: least-squares fit of
    ln(count) against ln(rank) over the group's vocabulary.

    Natural language sits near −1 (Zipf's law); keyword-stuffed spam,
    templated boilerplate, and random-token noise flatten toward 0 or
    steepen well past −1 — a cheap corpus-level quality/anomaly signal
    (used this way in web-corpus audits, e.g. CCNet's per-shard
    diagnostics).

    Plan shape: one explode + one (group, token) count aggregation —
    the only corpus-sized stage, with map-side partial aggregation —
    then ``row_number`` over a per-group window ORDERED BY (count
    desc, token asc) for deterministic ranks. The window's input is
    the AGGREGATED vocabulary, already ``min_count``-pruned (≪ corpus;
    bounded by vocab size, not doc count), and ``max_rank`` caps the
    fit to the head where Zipf behavior lives, so the regression
    reduces to five per-group sums. Slope is NULL for groups with
    fewer than two ranked types (the denominator is exactly 0 there).

    Returns ``(group_col, n_types long, zipf_slope double)`` where
    ``n_types`` counts the ranked (fitted) types.
    """
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    if max_rank < 1:
        raise ValueError(f"max_rank must be >= 1, got {max_rank}")
    toks = (df.where(F.col(text_col).isNotNull())
              .select(group_col,
                      F.explode(words_expr(F.col(text_col))).alias("w")))
    counts = (toks.groupBy(group_col, "w")
                  .agg(F.count(F.lit(1)).alias("c"))
                  .where(F.col("c") >= min_count))
    win = Window.partitionBy(group_col).orderBy(F.col("c").desc(),
                                                F.col("w").asc())
    ranked = (counts.withColumn("r", F.row_number().over(win))
                    .where(F.col("r") <= max_rank))
    x = F.log(F.col("r").cast("double"))
    y = F.log(F.col("c").cast("double"))
    agg = ranked.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_types"),
        F.sum(x).alias("_sx"), F.sum(y).alias("_sy"),
        F.sum(x * y).alias("_sxy"), F.sum(x * x).alias("_sxx"))
    n = F.col("n_types").cast("double")
    denom = n * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    slope = F.when(
        denom != 0,
        (n * F.col("_sxy") - F.col("_sx") * F.col("_sy")) / denom)
    return agg.select(group_col, "n_types", slope.alias("zipf_slope"))


def split_assign(df: DataFrame, key_col: str,
                 fractions: dict[str, float] | None = None,
                 salt: str = "split", out_col: str = "split") -> DataFrame:
    """Deterministic train/val/test assignment: ``out_col`` names the
    split each row belongs to, as a pure function of ``key_col``.

    ``fractions`` is an ORDERED name → fraction map summing to 1.0
    (default 98/1/1 train/val/test). The md5 bucket of the key is
    compared against cumulative lexicographic hex thresholds — the
    same cross-engine idiom as ``hash_sample_predicate`` — so the
    assignment is identical on any engine, partitioning, or cluster
    size, re-runs of a resumable job never move a document across the
    contamination boundary, and adding MORE data later never reassigns
    existing keys (the property rand()/randomSplit cannot give).

    Plan shape: one narrow CASE projection, no shuffle, no state.
    """
    # build (and validate) the CASE before touching df: a typo'd
    # fractions map must fail fast, not after upstream stages ran
    expr = split_expr(F.col(key_col), fractions, salt=salt)
    return df.withColumn(out_col, expr)


def split_expr(key_col: Column,
               fractions: dict[str, float] | None = None,
               salt: str = "split") -> Column:
    """The split-assignment CASE as a reusable Column — apply it to ANY
    key expression (a pair's id_a/id_b, a host) without materializing
    an assignment table; see ``split_assign`` for the semantics.

    A NULL key yields a NULL split (the key could not be derived —
    same exemption rationale as canonical_url_expr), which also keeps
    Spark and the SQL twin identical: concat_ws would silently SKIP
    the null and bucket every null key at md5(salt), while SQL string
    concat propagates NULL.
    """
    fractions = _validated_fractions(fractions)
    names = list(fractions)
    bucket = _bucket_expr(key_col, salt)
    # cumulative thresholds; the LAST split takes the residual hex
    # space (no threshold of its own), so float rounding can never
    # leave a bucket unassigned
    expr = None
    for name, thr in _split_thresholds(fractions):
        cond = bucket < F.lit(thr)
        expr = F.when(cond, F.lit(name)) if expr is None else \
            expr.when(cond, F.lit(name))
    expr = expr.otherwise(F.lit(names[-1]))
    return F.when(key_col.isNull(),
                  F.lit(None).cast("string")).otherwise(expr)


def _validated_fractions(
        fractions: dict[str, float] | None) -> dict[str, float]:
    if fractions is None:
        fractions = {"train": 0.98, "val": 0.01, "test": 0.01}
    if len(fractions) < 2:
        raise ValueError("need at least two splits")
    if any(f_ <= 0.0 for f_ in fractions.values()):
        # a zero/negative fraction silently yields an unreachable split
        # (its cumulative threshold is absorbed by its neighbors)
        raise ValueError(f"every split fraction must be > 0: {fractions}")
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1.0, got {total}")
    return fractions


def _split_thresholds(fractions: dict[str, float]):
    """(name, cumulative hex threshold) for every split but the last."""
    names = list(fractions)
    cum = 0.0
    out = []
    for name in names[:-1]:
        cum += fractions[name]
        out.append((name, _hex_threshold(cum)))
    return out


def duck_split_case(key_sql: str,
                    fractions: dict[str, float] | None = None,
                    salt: str = "split") -> str:
    """DuckDB twin of ``split_expr`` as a SQL CASE string — the single
    source for every oracle that re-derives the split, so the bucket
    idiom (salt format, substring width, thresholds) can never drift
    between an operator and its SQL twin. ``key_sql`` is a SQL
    expression for the key (NULL key → NULL split via string-concat
    NULL propagation, matching the Column form)."""
    fractions = _validated_fractions(fractions)
    names = list(fractions)
    whens = "".join(
        f" WHEN substring(md5('{salt}:' || CAST({key_sql} AS VARCHAR)),"
        f" 1, 8) < '{thr}' THEN '{name}'"
        for name, thr in _split_thresholds(fractions))
    return (f"CASE WHEN {key_sql} IS NULL THEN NULL{whens}"
            f" ELSE '{names[-1]}' END")


def split_leakage_stats(pairs: DataFrame, id_a: str = "id_a",
                        id_b: str = "id_b",
                        fractions: dict[str, float] | None = None,
                        salt: str = "split",
                        key_a: Column | None = None,
                        key_b: Column | None = None) -> DataFrame:
    """Contamination audit for a hash split: classify every near-dup
    pair by the splits its two sides land in. A ``leaked`` row
    (split_a ≠ split_b) is a document whose near-duplicate sits across
    the train/test boundary — the leakage that makes held-out scores
    lie. Run it over ``near_dup_pairs`` output before freezing a split;
    if leakage is material, split by a coarser key (host) or drop the
    leaked docs from the eval side.

    The split is recomputed per pair side as a pure CASE on the id —
    no join against an assignment table, so the audit adds one
    aggregation over the (tiny relative to corpus) pair set.
    ``sum_ids`` pins pair membership, not just counts.

    ``key_a``/``key_b`` override the split KEY expression per side
    (default: the id itself). Pass the ORIGIN key both sides derive
    from (host, canonical url, site id) to audit — or design — a
    group-aware split: near-dups sharing the origin then share the
    split by construction, which is the standard fix when the
    doc-level audit shows material leakage.
    """
    sa = split_expr(key_a if key_a is not None else F.col(id_a),
                    fractions, salt=salt)
    sb = split_expr(key_b if key_b is not None else F.col(id_b),
                    fractions, salt=salt)
    return (pairs.select(sa.alias("split_a"), sb.alias("split_b"),
                         F.col(id_a), F.col(id_b))
            .groupBy("split_a", "split_b")
            .agg(F.count(F.lit(1)).alias("n_pairs"),
                 F.sum(F.col(id_a) + F.col(id_b)).cast("long")
                  .alias("sum_ids"))
            .withColumn("leaked", F.col("split_a") != F.col("split_b")))


def shuffle_to_shards(df: DataFrame, key_col: str, n_shards: int,
                      salt: str = "shuffle", shard_col: str = "shard",
                      order_col: str = "shuffle_key") -> DataFrame:
    """Global deterministic corpus shuffle for training-data output.

    Training wants documents in (pseudo)random order, sharded into
    ``n_shards`` files. A true global sort-by-random-key is a range
    shuffle with a sampling pass and skew risk; instead the permutation
    is the pure key function md5(salt:key): ``shard_col`` = the first
    8 hex chars mod n_shards (one HASH shuffle, perfectly balanced in
    expectation), ``order_col`` = the full 32-hex digest, locally
    sorted within each shard. Reading shards in any order yields a
    deterministic pseudorandom document permutation, reproducible
    across runs and cluster sizes — and a downstream reader can verify
    placement from the key alone.

    Plan shape: one hash Exchange on ``shard_col`` + per-partition
    local sort (spillable, no global range partitioner, no sampling
    pass). All rows of a shard land in ONE task, but task↔shard is not
    1:1 (Spark routes by hash(shard) % n, so a task may hold two
    shards and another none) — the exact n_shards-file layout comes
    from writing with ``write_shards`` (partitionBy on the shard
    column), which emits exactly one file per shard regardless of
    task placement. At 10^12 docs pick n_shards so a shard ~ a few GB.
    A NULL key yields NULL shard/order (key-exemption rationale as in
    split_expr; partitionBy writes those under the null partition).
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    digest = F.when(
        F.col(key_col).isNull(), F.lit(None).cast("string")).otherwise(
        F.md5(F.concat_ws(":", F.lit(salt), F.col(key_col).cast("string"))))
    shard = F.pmod(F.conv(F.substring(digest, 1, 8), 16, 10).cast("long"),
                   F.lit(n_shards)).cast("int")
    out = (df.withColumn(order_col, digest)
             .withColumn(shard_col, shard))
    return (out.repartition(n_shards, F.col(shard_col))
               .sortWithinPartitions(shard_col, order_col))


def write_shards(sharded: DataFrame, path: str,
                 partition_cols: tuple[str, ...] = ("shard",),
                 order_col: str = "shuffle_key",
                 fmt: str = "parquet") -> None:
    """Write a ``shuffle_to_shards`` frame as exactly one file per
    partition-column combination (``path/shard=K/part-*``, or
    ``path/split=S/shard=K/...`` when a split column leads): every
    shard's rows live in a single task after the shard repartition, so
    partitionBy emits one sorted file per value — the balanced n-file
    training layout — independent of how hash(shard) % n packed
    shards into tasks.

    The explicit sortWithinPartitions here is load-bearing: the write
    path requires rows ordered by the PARTITION columns and would
    otherwise insert its own Sort on exactly those columns — which
    excludes ``order_col``, so within-file order would then depend on
    sort stability and spill-merge arrival, breaking the re-runs-are-
    byte-identical contract. Sorting (partition_cols…, order_col)
    satisfies the writer's requirement (prefix match, no extra sort)
    AND pins the in-file order.

    ``fmt="jsonl"`` emits gzipped JSON-lines shards instead (the
    format most training loaders stream directly); Spark's JSON writer
    base64-encodes binary columns natively — the read_pages_jsonl wire
    form — so no caller-side encoding is needed.
    """
    w = (sharded.sortWithinPartitions(*partition_cols, order_col)
                .write.partitionBy(*partition_cols).mode("overwrite"))
    if fmt == "parquet":
        w.parquet(path)
    elif fmt == "jsonl":
        w.option("compression", "gzip").json(path)
    else:
        raise ValueError(f"unknown fmt {fmt!r} (parquet or jsonl)")


def corpus_diff(old: DataFrame, new: DataFrame, id_col: str = "url",
                text_col: str = "text") -> DataFrame:
    """Snapshot diff between two curation runs: every id labeled
    ``added`` (new only), ``removed`` (old only), ``changed`` (both,
    content fingerprint differs — null-safe, so an extraction failure
    on one side counts as a change), or ``unchanged``.

    The ops tool for continuous curation: after a recrawl + re-curate,
    the diff is what a human reviews and what incremental consumers
    (index updaters, trainers with replay buffers) consume instead of
    the full corpus.

    PRECONDITION: ``id_col`` must be unique within each side (run the
    diff on CURATED snapshots — post exact-dedup — not raw crawls): a
    full-outer join fans out duplicate ids cartesian-per-key, so a
    url appearing twice on both sides would produce four diff rows.
    Shape: one fingerprint projection per side (no
    pre-shuffle state) + a single full-outer SMJ/hash join on the id —
    the minimum possible for a diff; both sides prune to
    (id, fingerprint) before the exchange, so 100-TB text never
    shuffles.
    """
    from datacanary_spark.operators.text_analysis import (
        content_fingerprint,
    )

    o = old.select(F.col(id_col).alias("_id_o"),
                   content_fingerprint(F.col(text_col)).alias("_fp_o"))
    n = new.select(F.col(id_col).alias("_id_n"),
                   content_fingerprint(F.col(text_col)).alias("_fp_n"))
    j = o.join(n, F.col("_id_o") == F.col("_id_n"), "full_outer")
    status = (F.when(F.col("_id_o").isNull(), F.lit("added"))
               .when(F.col("_id_n").isNull(), F.lit("removed"))
               .when(F.col("_fp_o").eqNullSafe(F.col("_fp_n")),
                     F.lit("unchanged"))
               .otherwise(F.lit("changed")))
    return j.select(F.coalesce(F.col("_id_n"), F.col("_id_o"))
                     .alias(id_col),
                    status.alias("status"))


def pearson_corr_by_group(df: DataFrame, x_col: str, y_col: str,
                          group_col: str = "lang") -> DataFrame:
    """Pearson r between two INTEGER columns per group, computed from
    exact int64 component sums (n, Σx, Σy, Σxy, Σx², Σy²) with the
    float arithmetic confined to one final cast-sqrt-divide — so the
    result is bit-identical on any engine, partitioning, or cluster
    size (no float accumulation order in the aggregate at all).

    The corpus use: does document length correlate with quality hits /
    token count per language — the sanity check before using length as
    a cheap quality proxy. One aggregation, map-side partials absorb
    the volume. Rows with a NULL in either column are excluded
    pairwise (the standard corr() semantics); groups with zero
    variance in either column yield NULL r.

    Overflow domain: sums and products run in decimal(38,0) — int64
    products like (Σx)² would wrap silently past Σx ≈ 3·10⁹, i.e. a
    few GB of text in ONE group. decimal(38,0) carries n·Σx² exactly
    to ~10³⁸: at 10¹² docs of 10⁴-char pages that term is ~10²⁰ —
    thirty orders of headroom, and matching DuckDB's HUGEINT
    promotion. The reported component columns stay decimal(38,0) so
    they are exact at any scale too.
    """
    dec = "decimal(38,0)"
    x = F.col(x_col).cast(dec)
    y = F.col(y_col).cast(dec)
    both = x.isNotNull() & y.isNotNull()
    agg = (df.where(both).groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast(dec).alias("sum_x"),
        F.sum(y).cast(dec).alias("sum_y"),
        F.sum((x * y).cast(dec)).cast(dec).alias("sum_xy"),
        F.sum((x * x).cast(dec)).cast(dec).alias("sum_xx"),
        F.sum((y * y).cast(dec)).cast(dec).alias("sum_yy")))
    n = F.col("n").cast(dec)
    num = ((n * F.col("sum_xy")).cast(dec)
           - (F.col("sum_x") * F.col("sum_y")).cast(dec)).cast("double")
    vx = ((n * F.col("sum_xx")).cast(dec)
          - (F.col("sum_x") * F.col("sum_x")).cast(dec)).cast("double")
    vy = ((n * F.col("sum_yy")).cast(dec)
          - (F.col("sum_y") * F.col("sum_y")).cast(dec)).cast("double")
    r = F.when((vx > 0) & (vy > 0),
               num / (F.sqrt(vx) * F.sqrt(vy)))
    return agg.withColumn("r", r)
