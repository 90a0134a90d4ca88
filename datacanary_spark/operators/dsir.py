"""DSIR-style importance resampling over hashed n-gram features.

Data Selection via Importance Resampling (Xie et al., NeurIPS 2023):
score every raw document by how much more likely its hashed n-gram
features are under a TARGET corpus distribution than under the RAW
corpus distribution, then keep the highest-weight documents. The
public method's bag-of-hashed-ngrams estimator maps cleanly onto
Spark:

* **Training** (two passes, tiny state): explode each corpus's word
  n-grams to hashed buckets and count per bucket. Buckets are the
  first ``hex_chars`` hex digits of ``md5(gram)`` (16^hex_chars
  buckets) — a string label, no hex→int conversion, so DuckDB's
  ``md5``/``substr`` reproduce it byte-for-byte for the oracle. The
  per-bucket shuffle after map-side partial aggregation is at most
  16^hex_chars rows per task — trivial at any corpus size; the counts
  are collected to the driver (16^hex_chars longs).
* **Log-ratio table** (driver-side, pure Python): add-alpha smoothing
  over the FULL bucket space, ``lr[b] = ln p_target[b] - ln p_raw[b]``
  — every bucket gets an entry, so scoring needs no missing-key
  default.
* **Scoring** (narrow, zero shuffle): per-doc weight =
  ``sum over grams of lr[bucket(gram)]`` folded with one linear
  ``aggregate`` over the doc's gram array against a CONSTANT-FOLDED
  literal map (``hex_chars`` <= 3, i.e. <= 4096 buckets → <= 8192
  plan literals, same budget philosophy as similarity's
  LITERAL_ASSIGN_BUDGET). Above that the literal map would bloat the
  plan, so scoring switches to the classic explode → broadcast-join →
  re-aggregate shape (one shuffle on the doc id) — ``mode="auto"``
  dispatches, mirroring the ANN literal/UDF dispatch.

Scale: training is one narrow pass + a 16^hex_chars-key shuffle per
corpus; literal-map scoring adds zero shuffles to the filter pipeline
(it pipelines inside the scan's codegen span). At 10^12 docs the DSIR
paper's 10^4 buckets fit the literal path exactly.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datacanary_spark.functions.heuristics import words_expr
from datacanary_spark.functions.repetition import ngrams_expr

# above this many buckets the log-ratio literal map leaves the plan-
# literal budget (2 literals per bucket) and scoring joins instead
LITERAL_MAP_BUDGET = 4096


@dataclass(frozen=True)
class DsirModel:
    """Trained log-ratio table: bucket hex-label -> ln(p_t) - ln(p_r).

    Complete over the 16^hex_chars bucket space (smoothing fills empty
    buckets), deterministic (pure function of the two corpora).
    """

    logratio: dict[str, float]
    n: int
    hex_chars: int
    alpha: float


def bucket_expr(gram: Column, hex_chars: int) -> Column:
    """Hashed-bucket label of one n-gram: first hex_chars of md5."""
    return F.substring(F.md5(gram), 1, hex_chars)


def _with_grams(df: DataFrame, text_col: str, n: int,
                out: str = "_dsir_grams") -> DataFrame:
    """Bind words THEN grams as named columns (staged projects).

    ``ngrams_expr`` slices its words argument once per output gram; fed
    a raw ``words_expr`` subtree that re-evaluates the whole
    split+filter per element — O(words²) per doc (the trigrams_expr
    lesson, heuristics.py:87; binding cut the sf0.1 scoring pass from
    6.1 s to well under 1 s). Callers must drop ``out``.
    """
    df = df.withColumns({"_dsir_w": words_expr(F.col(text_col))})
    df = df.withColumns({out: ngrams_expr(F.col("_dsir_w"), n)})
    return df.drop("_dsir_w")


def bucket_counts(df: DataFrame, text_col: str = "text", n: int = 2,
                  hex_chars: int = 2) -> dict[str, int]:
    """Per-bucket n-gram occurrence counts, collected to the driver
    (at most 16^hex_chars rows — the shuffle is map-side combined).

    The input is spread to default parallelism first: a one-file
    test-scale table is a single split, which would run the whole
    tokenize+hash pass on one core (the r03 single-split lesson,
    plans/partitioning.py); at real scale the scan already has enough
    splits and the spread is a no-op.

    ``explode_outer`` + post-filter, NOT plain ``explode``: Spark
    infers a ``size(grams) > 0`` filter from a non-outer Generate
    (InferFiltersFromGenerate) and pushes it below the repartition to
    the SCAN — re-evaluating the entire gram expression single-threaded
    on the unspread split (measured: the whole pass serialized, 7.3 s
    vs 1.9 s for ~266k bigrams at sf0.1)."""
    from datacanary_spark.plans.partitioning import spread_to_parallelism

    pruned = spread_to_parallelism(df.select(F.col(text_col)))
    rows = (_with_grams(pruned, text_col, n)
            .select(F.explode_outer("_dsir_grams").alias("g"))
            .where(F.col("g").isNotNull())
            .select(bucket_expr(F.col("g"), hex_chars).alias("b"))
            .groupBy("b").count().collect())
    return {r["b"]: r["count"] for r in rows}


def _all_buckets(hex_chars: int) -> list[str]:
    return [format(i, f"0{hex_chars}x") for i in range(16 ** hex_chars)]


def _paired_bucket_counts(target: DataFrame, raw: DataFrame, text_col: str,
                          n: int, hex_chars: int
                          ) -> tuple[dict[str, int], dict[str, int]]:
    """Both corpora's bucket counts in ONE Spark job (r06): tag each
    side, union, and count per (side, bucket) — the per-corpus counts
    are identical to two separate :func:`bucket_counts` passes, but the
    collect (and its job-scheduling round trip) happens once, and the
    two tokenize+hash map stages run concurrently inside one job
    instead of serially as two."""
    from datacanary_spark.plans.partitioning import spread_to_parallelism

    both = (target.select(F.lit(1).alias("_t"), F.col(text_col))
            .unionByName(raw.select(F.lit(0).alias("_t"), F.col(text_col))))
    pruned = spread_to_parallelism(both)
    rows = (_with_grams(pruned, text_col, n)
            .select("_t", F.explode_outer("_dsir_grams").alias("g"))
            .where(F.col("g").isNotNull())
            .select("_t", bucket_expr(F.col("g"), hex_chars).alias("b"))
            .groupBy("_t", "b").count().collect())
    ct = {r["b"]: r["count"] for r in rows if r["_t"] == 1}
    cr = {r["b"]: r["count"] for r in rows if r["_t"] == 0}
    return ct, cr


def train_dsir(target: DataFrame, raw: DataFrame, text_col: str = "text",
               n: int = 2, hex_chars: int = 2,
               alpha: float = 1.0) -> DsirModel:
    """Fit the hashed-ngram importance model: two counting passes +
    driver-side smoothing over the full bucket space."""
    if hex_chars < 1 or hex_chars > 4:
        raise ValueError(f"hex_chars must be in 1..4, got {hex_chars}")
    n_buckets = 16 ** hex_chars
    ct, cr = _paired_bucket_counts(target, raw, text_col, n, hex_chars)
    tot_t = sum(ct.values())
    tot_r = sum(cr.values())
    denom_t = math.log(tot_t + alpha * n_buckets)
    denom_r = math.log(tot_r + alpha * n_buckets)
    lr = {
        b: (math.log(ct.get(b, 0) + alpha) - denom_t)
           - (math.log(cr.get(b, 0) + alpha) - denom_r)
        for b in _all_buckets(hex_chars)
    }
    return DsirModel(logratio=lr, n=n, hex_chars=hex_chars, alpha=alpha)


def _literal_map(model: DsirModel) -> Column:
    ks, vs = zip(*sorted(model.logratio.items()))
    return F.map_from_arrays(
        F.array(*[F.lit(k) for k in ks]),
        F.array(*[F.lit(float(v)) for v in vs]))


def _literal_lookup(model: DsirModel, gram: Column) -> Column:
    """Log-ratio of one gram's bucket as a Column.

    When the table covers the FULL bucket space (the DsirModel
    contract; always true for :func:`train_dsir` output) the lookup is
    an O(1) literal-ARRAY index — the bucket label is fixed-width hex,
    so ``conv(label, 16, 10)`` is its array position. The previous
    ``element_at(map, label)`` form linear-scanned all 16^hex_chars
    map entries per gram (Spark's GetMapValue has no hash structure
    for literal maps): at hex_chars=2 that is 256 string compares per
    gram, ~50k per average doc — measured as the dominant scoring
    cost. A foreign model whose label set is not exactly the canonical
    lowercase bucket space (missing buckets, uppercase/odd labels —
    where sorted() order would not match conv() positions) falls back
    to the map with its original semantics."""
    if sorted(model.logratio) != _all_buckets(model.hex_chars):
        return F.element_at(_literal_map(model),
                            bucket_expr(gram, model.hex_chars))
    vs = [float(v) for _, v in sorted(model.logratio.items())]
    idx = F.conv(bucket_expr(gram, model.hex_chars),
                 16, 10).cast("int") + 1
    return F.element_at(F.lit(vs), idx)


def with_dsir_weights(df: DataFrame, model: DsirModel,
                      text_col: str = "text",
                      weight_col: str = "dsir_weight",
                      id_col: str | None = None,
                      mode: str = "auto") -> DataFrame:
    """Attach the per-doc importance weight (0.0 for docs too short to
    form an n-gram).

    ``mode``: "literal" folds the log-ratio map into the plan and sums
    with one linear aggregate per row (no shuffle — the default below
    LITERAL_MAP_BUDGET buckets); "join" explodes grams, broadcast-joins
    the ratio table and re-aggregates on ``id_col`` (required there) —
    the unbounded-bucket path. Both produce identical sums up to float
    association (literal folds in doc order; join sums in shuffle
    order) — agreement pinned by test at 1e-9.
    """
    n_buckets = 16 ** model.hex_chars
    if mode == "auto":
        mode = "literal" if n_buckets <= LITERAL_MAP_BUDGET else "join"
    if mode == "literal":
        staged = _with_grams(df, text_col, model.n)
        w = F.aggregate(
            F.col("_dsir_grams"), F.lit(0.0),
            lambda acc, g: acc + _literal_lookup(model, g))
        return staged.withColumn(weight_col, w).drop("_dsir_grams")
    if mode != "join":
        raise ValueError(f"mode must be auto|literal|join, got {mode!r}")
    if id_col is None:
        raise ValueError("mode='join' needs id_col to re-aggregate on")
    spark = df.sparkSession
    ratios = spark.createDataFrame(
        sorted(model.logratio.items()), "b string, _lr double")
    per_doc = (_with_grams(df, text_col, model.n)
                 .select(F.col(id_col),
                         F.explode_outer("_dsir_grams").alias("g"))
                 .select(id_col,
                         bucket_expr(F.col("g"), model.hex_chars).alias("b"))
                 .join(F.broadcast(ratios), "b", "left")
                 .groupBy(id_col)
                 .agg(F.coalesce(F.sum("_lr"), F.lit(0.0))
                       .alias(weight_col)))
    return df.join(per_doc, id_col, "left")


def dsir_select(df: DataFrame, model: DsirModel, keep_fraction: float,
                text_col: str = "text", tie_col: str = "url",
                weight_col: str = "dsir_weight",
                id_col: str | None = None,
                mode: str = "auto",
                persist=True) -> DataFrame:
    """Keep the top ``keep_fraction`` of docs by importance weight.

    Threshold = the exact (1-keep_fraction) percentile of the weight
    distribution — one sort-based aggregate; at 10^12 docs swap in
    ``approx_percentile`` (the only change) if the exact single-pass
    sort of 8·n bytes of doubles is too hot. Ties at the threshold are
    all kept (deterministic: membership is a pure function of the
    weight, never of partition order); when ``tie_col`` exists in the
    frame the result is ordered by (weight desc, tie_col asc) so
    downstream writes are reproducible byte-for-byte — without it the
    selection is still deterministic as a SET, just not as a sequence.

    ``id_col``/``mode`` forward to :func:`with_dsir_weights` — required
    for models whose bucket count exceeds LITERAL_MAP_BUDGET (the
    join-mode path re-aggregates on ``id_col``; falls back to
    ``tie_col`` when unset, which is an id in every pipeline use).
    ``persist`` (tri-state: bool or CacheScope) pins the scored frame —
    the percentile collect AND the returned selection both read it, and
    unpersisted each would rerun the full tokenize+hash scoring pass.
    """
    from datacanary_spark.plans.caching import maybe_persist

    if not 0.0 < keep_fraction <= 1.0:
        raise ValueError(f"keep_fraction in (0, 1], got {keep_fraction}")
    scored = with_dsir_weights(df, model, text_col, weight_col,
                               id_col=id_col or tie_col, mode=mode)
    order = [F.col(weight_col).desc()]
    if tie_col in scored.columns:
        order.append(F.col(tie_col).asc())
    if keep_fraction == 1.0:
        return scored.orderBy(*order)
    scored = maybe_persist(scored, persist)
    thr = scored.select(
        F.expr(f"percentile({weight_col}, {1.0 - keep_fraction})")
         .alias("t")).collect()[0]["t"]
    if thr is None:  # empty input: no percentile, nothing to select
        return scored
    return scored.where(F.col(weight_col) >= F.lit(float(thr))) \
                 .orderBy(*order)
