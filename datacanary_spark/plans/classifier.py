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


def featurized(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the feature columns (double, nulls → 0.0: a null-text doc
    has every stat undefined and scores as the zero vector)."""
    from datacanary_spark.functions.heuristics import with_text_stats

    d = with_text_stats(df, text_col=text_col)
    for n in FEATURE_NAMES:
        d = d.withColumn(
            f"feat_{n}",
            F.coalesce(F.col(f"stat_{n}").cast("double"), F.lit(0.0)))
    return d


def train_quality_classifier(df: DataFrame, label_col: str,
                             text_col: str = "text", max_iter: int = 50,
                             reg_param: float = 0.0) -> QualityClassifier:
    """Fit logistic regression on the labeled frame; returns the
    coefficient bundle for expression inference. ``label_col`` is
    0/1 (drop = 0, keep = 1)."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    d = featurized(df, text_col).where(F.col(label_col).isNotNull())
    assembler = VectorAssembler(
        inputCols=[f"feat_{n}" for n in FEATURE_NAMES],
        outputCol="features")
    lr = LogisticRegression(maxIter=max_iter, regParam=reg_param,
                            labelCol=label_col, featuresCol="features")
    model = lr.fit(assembler.transform(d).select(
        "features", F.col(label_col).cast("double").alias(label_col)))
    return QualityClassifier(
        FEATURE_NAMES,
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
    projection, no shuffle, no Python."""
    d = featurized(df, text_col)
    prob = quality_prob_expr(clf)
    return (d.withColumn("quality_prob", prob)
             .withColumn("keep_pred", (prob >= F.lit(threshold))))


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
