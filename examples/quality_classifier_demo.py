"""Library-composition example: distill the quality-filter verdicts
into a trained classifier, then score a corpus with a pure-expression
pass.

The distillation pattern real pipelines use at 10^12 docs: the full
verdict stack (heuristics + langid + perplexity models) is run on a
SAMPLE to produce labels; a logistic regression trained on those labels
then scores the whole corpus as one narrow codegen projection — no
model broadcast, no Python workers on the big pass.

    python examples/quality_classifier_demo.py [n_docs]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(n_docs: int = 2000) -> dict:
    from pyspark.sql import functions as F

    from datacanary_spark.operators.corpus_stats import hash_sample_predicate
    from datacanary_spark.plans import classifier as qc
    from datacanary_spark.plans.pipeline import broadcast_models, filter_pages
    from datacanary_spark.session import get_spark
    from datacanary_spark.sources.fixtures import pages_spark_df

    spark = get_spark(app_name="example_classifier")
    pages = pages_spark_df(spark, n_docs, seed=11)

    # 1. full verdict pipeline on a 30% hash sample → training labels
    sample = pages.where(hash_sample_predicate(F.col("url"), 0.3,
                                               salt="distill"))
    bc = broadcast_models(spark)
    # verdicts carry the SCRUBBED text; train on the original text the
    # scoring pass will see (join labels back by url)
    verdicts = filter_pages(sample, bc).select(
        "url", F.col("keep").cast("int").alias("label"))
    labeled = sample.select("url", "text").join(verdicts, "url")
    n_labeled = labeled.count()

    # 2. train (distributed LBFGS over heuristic text stats)
    clf = qc.train_quality_classifier(labeled, "label")
    print("coefficients:")
    for name, w in zip(clf.feature_names, clf.weights):
        print(f"  {name:22s} {w:+.5f}")
    print(f"  intercept              {clf.intercept:+.5f}")

    # 3. score the WHOLE corpus with the expression path (no models,
    #    no Python) and compare against the full pipeline's verdicts
    scored = qc.classify(pages, clf)
    full = filter_pages(pages, bc).select("url", "keep")
    joined = scored.select("url", "keep_pred").join(full, "url")
    agg = joined.agg(
        F.sum((F.col("keep_pred") == F.col("keep")).cast("int"))
        .alias("agree"),
        F.count(F.lit(1)).alias("n")).first()
    agreement = agg["agree"] / agg["n"]
    print(f"\nlabeled sample: {n_labeled} docs; corpus: {agg['n']} docs")
    print(f"classifier vs full-pipeline agreement: {agreement:.3f}")
    assert agreement > 0.85, agreement

    # 4. same distillation with the EXTENDED feature space
    #    (readability/code/entropy signals) — still a pure expression
    #    scoring pass; prints the comparison so the wider space's value
    #    is visible on the fixture
    clf_ext = qc.train_quality_classifier(
        labeled, "label", feature_names=qc.EXTENDED_FEATURE_NAMES)
    joined_ext = (qc.classify(pages, clf_ext).select("url", "keep_pred")
                  .join(full, "url"))
    agg_ext = joined_ext.agg(
        F.sum((F.col("keep_pred") == F.col("keep")).cast("int"))
        .alias("agree"),
        F.count(F.lit(1)).alias("n")).first()
    agreement_ext = agg_ext["agree"] / agg_ext["n"]
    print(f"extended-feature agreement:            {agreement_ext:.3f}")
    assert agreement_ext > 0.85, agreement_ext
    return {"n_labeled": n_labeled, "agreement": agreement,
            "agreement_extended": agreement_ext,
            "weights": clf.to_dict()}


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2000)
