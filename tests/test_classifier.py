"""Trained quality classifier: Spark ML training, pure-expression
inference. Pins (a) generalization F1 on a held-out split, (b) exact
agreement between the Column-expression sigmoid and MLlib's own
transform probabilities, (c) a UDF-free scoring plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datacanary_spark.operators.corpus_stats import hash_sample_predicate
from datacanary_spark.plans import classifier as qc


def _labeled_pages(spark):
    """Fixture pages labeled by the golden filter pipeline's heuristic
    verdict — the 'seed labels' a classifier generalizes from."""
    from datacanary_spark.functions.heuristics import (
        FilterConfig,
        heuristic_hit_exprs,
        stat_cols,
        with_text_stats,
    )
    from datacanary_spark.sources.fixtures import pages_spark_df

    pages = pages_spark_df(spark, 1200, seed=77)
    d = with_text_stats(pages, text_col="text")
    hits = heuristic_hit_exprs(FilterConfig(), stat_cols())
    label = F.lit(1)
    for h in hits.values():
        label = F.when(h > 0, 0).otherwise(label)
    return d.select("url", "text", label.alias("label"))


@pytest.fixture(scope="module")
def labeled_pages(spark):
    return _labeled_pages(spark)


def test_classifier_generalizes_and_matches_mllib(spark, labeled_pages):
    train = labeled_pages.where(
        hash_sample_predicate(F.col("url"), 0.7, salt="clfsplit"))
    test = labeled_pages.where(
        ~hash_sample_predicate(F.col("url"), 0.7, salt="clfsplit"))
    clf = qc.train_quality_classifier(train, "label")
    assert len(clf.weights) == len(qc.FEATURE_NAMES)

    scored = qc.classify(test, clf)
    agg = scored.select(
        F.sum(((F.col("keep_pred")) & (F.col("label") == 1)).cast("int"))
        .alias("tp"),
        F.sum(((F.col("keep_pred")) & (F.col("label") == 0)).cast("int"))
        .alias("fp"),
        F.sum(((~F.col("keep_pred")) & (F.col("label") == 1)).cast("int"))
        .alias("fn"),
    ).first()
    prec = agg["tp"] / max(agg["tp"] + agg["fp"], 1)
    rec = agg["tp"] / max(agg["tp"] + agg["fn"], 1)
    f1 = 2 * prec * rec / max(prec + rec, 1e-9)
    assert f1 >= 0.9, (prec, rec, f1)

    # expression inference == MLlib transform probabilities
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.functions import vector_to_array

    d = qc.featurized(train, "text")
    assembler = VectorAssembler(
        inputCols=[f"feat_{n}" for n in qc.FEATURE_NAMES],
        outputCol="features")
    model = LogisticRegression(maxIter=50, regParam=0.0,
                               labelCol="label").fit(
        assembler.transform(d).select(
            "features", F.col("label").cast("double").alias("label")))
    ml_probs = {r["url"]: r["p"] for r in model.transform(
        assembler.transform(qc.featurized(test, "text")))
        .select("url", vector_to_array("probability")[1].alias("p"))
        .collect()}
    expr_probs = {r["url"]: r["quality_prob"] for r in
                  scored.select("url", "quality_prob").collect()}
    assert set(ml_probs) == set(expr_probs)
    for u in ml_probs:
        assert expr_probs[u] == pytest.approx(ml_probs[u], abs=1e-9), u


def test_classifier_scoring_plan_is_pure_codegen(spark, labeled_pages):
    """The 10^12-doc scoring pass must be one narrow projection: no
    Python evaluation, no shuffle, no MLlib transformer in the plan."""
    clf = qc.QualityClassifier(
        qc.FEATURE_NAMES, tuple([0.01] * len(qc.FEATURE_NAMES)), -0.5)
    plan = qc.classify(labeled_pages.select("url", "text"), clf) \
        ._jdf.queryExecution().executedPlan().toString()
    for bad in ("ArrowEvalPython", "BatchEvalPython", "Exchange",
                "FlatMapGroupsInPandas"):
        assert bad not in plan, bad


def test_classifier_roundtrip_and_null_text(spark):
    clf = qc.QualityClassifier(qc.FEATURE_NAMES,
                               tuple([0.5] * len(qc.FEATURE_NAMES)), 0.1)
    assert qc.QualityClassifier.from_dict(clf.to_dict()) == clf
    df = spark.createDataFrame([("u1", None)], "url: string, text: string")
    row = qc.classify(df, clf).first()
    # null text → zero feature vector → sigmoid(intercept)
    import math

    assert row["quality_prob"] == pytest.approx(
        1 / (1 + math.exp(-0.1)), abs=1e-12)


def test_save_load_classifier_file_roundtrip(spark, tmp_path):
    """save_classifier/load_classifier go through the Hadoop FS client
    (cloud-scheme-capable) and reproduce the exact coefficients."""
    clf = qc.QualityClassifier(
        qc.FEATURE_NAMES,
        tuple(0.125 * (i + 1) for i in range(len(qc.FEATURE_NAMES))),
        -1.75)
    uri = str(tmp_path / "model.json")
    qc.save_classifier(spark, clf, uri)
    assert qc.load_classifier(spark, uri) == clf


def test_curate_with_classifier_stage(spark, tmp_path):
    """curate --classifier-model end-to-end: the learned filter runs
    after the heuristic keep stage, its count lands in the lineage
    summary, and a strict threshold drops more docs than a permissive
    one."""
    from datacanary_spark.plans.curate import run_curation_job
    from datacanary_spark.sources.fixtures import write_pages_parquet

    pages = str(tmp_path / "pages")
    write_pages_parquet(pages, n_docs=250, seed=31)

    # train on golden-filter labels over a disjoint fixture sample
    clf = qc.train_quality_classifier(_labeled_pages(spark), "label")
    model_uri = str(tmp_path / "model.json")
    qc.save_classifier(spark, clf, model_uri)

    out_loose = str(tmp_path / "loose")
    s_loose = run_curation_job(spark, pages, out_loose,
                               classifier_model=model_uri,
                               classifier_threshold=0.05)
    out_strict = str(tmp_path / "strict")
    s_strict = run_curation_job(spark, pages, out_strict,
                                classifier_model=model_uri,
                                classifier_threshold=0.95)
    assert "after_classifier" in s_loose and "after_classifier" in s_strict
    assert s_loose["kept"] >= s_loose["after_classifier"] > 0
    assert s_strict["after_classifier"] <= s_loose["after_classifier"]
    assert s_loose["final_docs"] > 0


def test_from_dict_rejects_mismatched_bundle():
    """A truncated/hand-edited coefficient bundle (7 names, 5 weights)
    must fail loudly at load time, not silently mis-score the corpus."""
    good = {"feature_names": ["a", "b"], "weights": [0.1, 0.2],
            "intercept": 0.0}
    qc.QualityClassifier.from_dict(good)  # sanity: valid bundle loads
    bad = {"feature_names": ["a", "b", "c"], "weights": [0.1, 0.2],
           "intercept": 0.0}
    with pytest.raises(ValueError, match="mismatch"):
        qc.QualityClassifier.from_dict(bad)


def test_extended_feature_space(spark, labeled_pages):
    """EXTENDED_FEATURE_NAMES trains and scores end-to-end: the bundle
    records the wider name list, classify featurizes FROM the bundle,
    the scoring plan stays pure codegen, and an unknown name fails
    fast instead of scoring a silently-zero feature."""
    train = labeled_pages.where(
        hash_sample_predicate(F.col("url"), 0.7, salt="clfsplit"))
    clf = qc.train_quality_classifier(
        train, "label", feature_names=qc.EXTENDED_FEATURE_NAMES)
    assert clf.feature_names == qc.EXTENDED_FEATURE_NAMES
    assert len(clf.weights) == len(qc.EXTENDED_FEATURE_NAMES)

    # scoring follows the bundle (no feature_names arg needed)
    scored = qc.classify(labeled_pages.select("url", "text"), clf)
    assert scored.where(F.col("quality_prob").isNull()).count() == 0

    # the wider space keeps the scoring plan a pure narrow projection
    plan = scored._jdf.queryExecution().executedPlan().toString()
    for bad in ("ArrowEvalPython", "BatchEvalPython", "Exchange",
                "FlatMapGroupsInPandas"):
        assert bad not in plan, bad

    # bundle round-trips with the extended names
    assert qc.QualityClassifier.from_dict(clf.to_dict()) == clf

    # fail-fast on a typo'd feature name
    with pytest.raises(ValueError, match="unknown feature names"):
        qc.featurized(labeled_pages, feature_names=("flesch", "nope"))


def test_extended_features_match_signal_modules(spark):
    """The feat_* columns of the extended space agree with the signal
    modules' own golden twins (no drift between the classifier's
    feature expressions and the shipped signal definitions)."""
    from datacanary_spark.functions.readability import golden_readability

    texts = [
        "The quick brown fox jumps over the lazy dog. A fine day!",
        "import os\n    total = 0;\n    emit(total);\nreturn total",
        None,
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id: int, text: string")
    d = qc.featurized(df, feature_names=qc.EXTENDED_FEATURE_NAMES)
    rows = {r["doc_id"]: r for r in d.collect()}
    for i, t in enumerate(texts):
        g = golden_readability(t)
        want_flesch = g["flesch"] if g["flesch"] is not None else 0.0
        assert rows[i]["feat_flesch"] == pytest.approx(want_flesch)
        want_clf = (g["code_line_fraction"]
                    if g["code_line_fraction"] is not None else 0.0)
        assert rows[i]["feat_code_line_fraction"] == pytest.approx(want_clf)


def test_classify_top_fraction_selection_law(spark, labeled_pages):
    """Top-fraction selection: membership is a pure function of the
    margin (partition-invariant), the kept count honors the fraction up
    to threshold ties, and every kept margin >= every dropped margin."""
    docs = labeled_pages.select("url", "text")
    n = docs.count()
    clf = qc.QualityClassifier(
        qc.FEATURE_NAMES,
        tuple(0.01 * (i + 1) for i in range(len(qc.FEATURE_NAMES))), -0.5)

    kept = qc.classify_top_fraction(docs, clf, 0.25, persist=False)
    k = kept.count()
    # >= because ties at the exact percentile are all kept
    assert n * 0.25 <= k + 1 and k < n
    # boundary law: min kept margin >= max dropped margin
    kept_ids = {r["url"] for r in kept.collect()}
    scored = qc.classify(docs, clf).select(
        "url", F.col("quality_prob").alias("p")).collect()
    min_kept = min(r["p"] for r in scored if r["url"] in kept_ids)
    dropped = [r["p"] for r in scored if r["url"] not in kept_ids]
    assert not dropped or min_kept >= max(dropped)

    # partition-invariance: same SET at any parallelism
    kept2 = {r["url"] for r in qc.classify_top_fraction(
        docs.repartition(13), clf, 0.25, persist=False).collect()}
    assert kept2 == kept_ids

    # keep_fraction=1.0 keeps everything; bad fraction fails fast
    assert qc.classify_top_fraction(docs, clf, 1.0).count() == n
    with pytest.raises(ValueError, match="keep_fraction"):
        qc.classify_top_fraction(docs, clf, 0.0)

    # margin_col collision fails FAST (r05, ADVICE r04): a silent
    # rename would leave callers reading their own stale column
    with pytest.raises(ValueError, match="margin_col"):
        qc.classify_top_fraction(
            docs.withColumn("quality_margin", F.lit(0.0)), clf, 0.25,
            persist=False)


def test_curate_classifier_keep_fraction(spark, tmp_path):
    """curate --classifier-keep-fraction: DCLM-style top-fraction stage
    replaces the fixed threshold; lineage counts honor the fraction."""
    from datacanary_spark.plans.curate import run_curation_job
    from datacanary_spark.sources.fixtures import write_pages_parquet

    pages = str(tmp_path / "pages")
    write_pages_parquet(pages, n_docs=250, seed=31)
    clf = qc.train_quality_classifier(_labeled_pages(spark), "label")
    model_uri = str(tmp_path / "model.json")
    qc.save_classifier(spark, clf, model_uri)

    s = run_curation_job(spark, pages, str(tmp_path / "frac"),
                         classifier_model=model_uri,
                         classifier_keep_fraction=0.5)
    assert "after_classifier" in s
    # top-50% of the heuristic-kept docs, ties kept
    assert s["kept"] * 0.5 <= s["after_classifier"] + 1
    assert s["after_classifier"] < s["kept"]
    assert s["final_docs"] > 0
