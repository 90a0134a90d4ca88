"""Model-based quality filtering: TRAIN in-cluster with Spark ML,
INFER with pure Column expressions.

The modern web-corpus pattern (DCLM / fineweb-edu style): a small
labeled seed set (golden labels, human ratings, or an LLM-judged
sample) trains a lightweight classifier whose scores then filter the
full corpus. The Spark-first split of that job:

* **Training** is a Spark ML ``LogisticRegression`` fit over the
  heuristic text-statistics features (`functions/heuristics.
  with_text_stats` — all pure codegen) — distributed LBFGS, scales
  with the labeled set, runs where the data lives.
* **Inference** is ``sigmoid(w·x + b)`` rebuilt as a Column expression
  with the trained coefficients as plan literals: whole-stage codegen,
  no MLlib on the scoring path, no UDF, no model file to ship — the
  10^12-doc scoring pass is one narrow projection. Equivalence with
  ``model.transform`` probabilities is pinned by test.

Reference lineage: generalizes the reference's fixed-threshold rules
(/root/reference/src/datacanary/rules/rule_engine.py) into learned
thresholds over the same kind of per-document statistics.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Features: the numeric per-doc text statistics. Deliberately excludes
# line-structure stats that are degenerate on single-line fixture docs.
FEATURE_NAMES = (
    "n_chars", "word_count", "mean_word_length", "symbol_to_word_ratio",
    "stopword_fraction", "dup_line_fraction", "dup_trigram_fraction",
)

# Opt-in wider feature space: readability / code-shape / entropy
# signals join the base stats. The bundle records whichever names it
# was trained with, and `classify` featurizes FROM THE BUNDLE — so
# base and extended models coexist and score correctly side by side.
EXTENDED_FEATURE_NAMES = FEATURE_NAMES + (
    "flesch", "code_line_fraction", "code_punct_density", "char_entropy",
)


def _extended_exprs(text_col: str) -> dict[str, Column]:
    """Column expressions for the non-`with_text_stats` feature names —
    all pure codegen expressions (the scoring-plan contract: no UDF, no
    shuffle, holds for the extended set too)."""
    from datacanary_spark.functions.heuristics import words_expr
    from datacanary_spark.functions.readability import (
        code_line_count_expr,
        code_punct_count_expr,
        flesch_expr,
        sentence_count_expr,
        syllables_expr,
    )
    from datacanary_spark.operators.text_analysis import char_entropy_expr

    col = F.col(text_col)
    words = words_expr(col)
    lines = F.split(col, "\n")
    return {
        "flesch": flesch_expr(F.size(words).cast("long"),
                              sentence_count_expr(col),
                              syllables_expr(words)),
        "code_line_fraction": F.try_divide(
            code_line_count_expr(lines).cast("double"),
            F.size(lines).cast("double")),
        "code_punct_density": F.try_divide(
            code_punct_count_expr(col).cast("double"),
            F.length(col).cast("double")),
        "char_entropy": char_entropy_expr(col),
    }


@dataclass(frozen=True)
class QualityClassifier:
    """Trained coefficients — a few floats, trivially serializable
    (JSON/pickle) and embeddable as plan literals."""

    feature_names: tuple[str, ...]
    weights: tuple[float, ...]
    intercept: float

    def to_dict(self) -> dict:
        return {"feature_names": list(self.feature_names),
                "weights": list(self.weights),
                "intercept": self.intercept}

    @classmethod
    def from_dict(cls, d: dict) -> "QualityClassifier":
        names = tuple(d["feature_names"])
        weights = tuple(float(w) for w in d["weights"])
        if len(names) != len(weights):
            raise ValueError(
                f"classifier bundle mismatch: {len(names)} feature_names "
                f"vs {len(weights)} weights — refusing to score with a "
                f"truncated model")
        return cls(names, weights, float(d["intercept"]))


def featurized(df: DataFrame, text_col: str = "text",
               feature_names: tuple[str, ...] = FEATURE_NAMES) -> DataFrame:
    """Attach the feature columns (double, nulls → 0.0: a null-text doc
    has every stat undefined and scores as the zero vector; a
    no-sentence doc's flesch is likewise 0).

    ``feature_names`` picks the space: base stats resolve via
    ``with_text_stats``, extended names via ``_extended_exprs``;
    an unknown name fails fast (a typo'd bundle must not score a
    silently-zero feature)."""
    from datacanary_spark.functions.heuristics import (
        STAT_NAMES,
        with_text_stats,
    )

    extra = _extended_exprs(text_col)
    unknown = [n for n in feature_names
               if n not in STAT_NAMES and n not in extra]
    if unknown:
        raise ValueError(f"unknown feature names: {unknown} "
                         f"(known: {sorted((*STAT_NAMES, *extra))})")
    d = with_text_stats(df, text_col=text_col)
    for n in feature_names:
        src = F.col(f"stat_{n}") if n in STAT_NAMES else extra[n]
        d = d.withColumn(f"feat_{n}",
                         F.coalesce(src.cast("double"), F.lit(0.0)))
    return d


def train_quality_classifier(
        df: DataFrame, label_col: str, text_col: str = "text",
        max_iter: int = 50, reg_param: float = 0.0,
        feature_names: tuple[str, ...] = FEATURE_NAMES) -> QualityClassifier:
    """Fit logistic regression on the labeled frame; returns the
    coefficient bundle for expression inference. ``label_col`` is
    0/1 (drop = 0, keep = 1). Pass ``EXTENDED_FEATURE_NAMES`` (or any
    known subset) for the wider readability/code/entropy space — the
    bundle records the names, and scoring follows the bundle."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    feature_names = tuple(feature_names)
    d = featurized(df, text_col, feature_names) \
        .where(F.col(label_col).isNotNull())
    assembler = VectorAssembler(
        inputCols=[f"feat_{n}" for n in feature_names],
        outputCol="features")
    lr = LogisticRegression(maxIter=max_iter, regParam=reg_param,
                            labelCol=label_col, featuresCol="features")
    model = lr.fit(assembler.transform(d).select(
        "features", F.col(label_col).cast("double").alias(label_col)))
    return QualityClassifier(
        feature_names,
        tuple(float(c) for c in model.coefficients),
        float(model.intercept))


def quality_margin_expr(clf: QualityClassifier,
                        feature_prefix: str = "feat_") -> Column:
    """The raw margin z = w·x + b as a Column expression (strictly
    left-associated, so the float64 evaluation order is deterministic
    and reproducible by any engine writing the same expression text).
    Monotone in P(keep), so thresholding z against logit(t) is exactly
    thresholding the probability against t — the margin is the
    exactness-friendly twin of :func:`quality_prob_expr` (no ``exp``,
    whose last-ulp behavior is libm-specific)."""
    z = F.lit(clf.intercept)
    for name, w in zip(clf.feature_names, clf.weights, strict=True):
        z = z + F.lit(w) * F.col(feature_prefix + name)
    return z


def quality_prob_expr(clf: QualityClassifier,
                      feature_prefix: str = "feat_") -> Column:
    """P(keep) = sigmoid(w·x + b) as a pure Column expression over the
    ``feat_*`` columns — the zero-dependency scoring path."""
    z = quality_margin_expr(clf, feature_prefix)
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def classify(df: DataFrame, clf: QualityClassifier,
             text_col: str = "text",
             threshold: float = 0.5) -> DataFrame:
    """Score + thresholded keep decision; one narrow codegen
    projection, no shuffle, no Python. Featurizes FROM THE BUNDLE's
    feature names, so base and extended models both score correctly."""
    d = featurized(df, text_col, clf.feature_names)
    prob = quality_prob_expr(clf)
    return (d.withColumn("quality_prob", prob)
             .withColumn("keep_pred", (prob >= F.lit(threshold))))


def classify_top_fraction(df: DataFrame, clf: QualityClassifier,
                          keep_fraction: float, text_col: str = "text",
                          tie_col: str = "url",
                          margin_col: str = "quality_margin",
                          persist=True) -> DataFrame:
    """DCLM-style selection: keep the top ``keep_fraction`` of docs by
    classifier score (DCLM keeps the top ~10% by fastText-classifier
    score rather than thresholding at a fixed probability).

    Thresholds the MARGIN z = w·x + b (monotone in P(keep), no ``exp``
    — the exactness-friendly twin) at its exact (1-keep_fraction)
    percentile: one sort-based aggregate collecting a single double; at
    10^12 docs swap in ``approx_percentile`` (the only change). Ties at
    the threshold are all kept — membership is a pure function of the
    score, never of partition order — and with ``tie_col`` present the
    result orders by (margin desc, tie asc) for byte-reproducible
    downstream writes (same contract as ``dsir.dsir_select``).

    ``persist`` (bool or CacheScope) pins the scored frame read by both
    the percentile collect and the returned selection.
    """
    from datacanary_spark.plans.caching import maybe_persist

    if not 0.0 < keep_fraction <= 1.0:
        raise ValueError(f"keep_fraction in (0, 1], got {keep_fraction}")
    if margin_col in df.columns:
        # fail fast (same philosophy as ``featurized``): a silent
        # rename would leave the caller reading its own pre-existing
        # column wherever it references the requested margin_col
        raise ValueError(
            f"margin_col {margin_col!r} already exists in the input — "
            f"pass a different margin_col or drop/rename the column")
    d = featurized(df, text_col, clf.feature_names)
    scored = d.select(*df.columns,
                      quality_margin_expr(clf).alias(margin_col))
    order = [F.col(margin_col).desc()]
    if tie_col in scored.columns:
        order.append(F.col(tie_col).asc())
    if keep_fraction == 1.0:
        return scored.orderBy(*order)
    scored = maybe_persist(scored, persist)
    # round the quantile: 1.0 - 0.7 is 0.30000000000000004 in float64,
    # and interpolating at that q vs the decimal literal 0.3 can move
    # the threshold across a boundary doc when (n-1)*q lands on an
    # integer — any engine reproducing the selection from the stated
    # fraction (the DuckDB oracle, a reimplementation) would disagree
    q = round(1.0 - keep_fraction, 12)
    thr = scored.select(
        F.expr(f"percentile({margin_col}, {q!r})")
         .alias("t")).collect()[0]["t"]
    if thr is None:  # empty input
        return scored
    return scored.where(F.col(margin_col) >= F.lit(float(thr))) \
                 .orderBy(*order)


def save_classifier(spark, clf: QualityClassifier, uri: str) -> None:
    """Persist the coefficient bundle as JSON to any filesystem scheme
    (local, s3a://, abfss://, gs://) — it is a few floats, so the model
    artifact travels with the data, not the driver host."""
    import json

    from datacanary_spark.sources.io import write_text

    write_text(spark, uri, json.dumps(clf.to_dict(), indent=2,
                                      sort_keys=True))


def load_classifier(spark, uri: str) -> QualityClassifier:
    """Load a coefficient bundle written by :func:`save_classifier`."""
    import json

    from datacanary_spark.sources.io import read_text

    return QualityClassifier.from_dict(json.loads(read_text(spark, uri)))
