"""End-to-end quality-filter parity: Spark pipeline vs golden twin.

The BASELINE gate: keep/drop F1 ≥ 0.99 (we assert exact agreement) and
byte-identical scrubbed/extracted text per url.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from datacanary_spark.functions.heuristics import FilterConfig
from datacanary_spark.golden import f1_score, golden_labels
from datacanary_spark.plans.lineage import (
    corpus_metrics,
    host_metrics_salted,
    partition_lineage,
)
from datacanary_spark.plans.pipeline import broadcast_models, filter_pages
from datacanary_spark.sources.fixtures import generate_pages_pandas, pages_spark_df

N_DOCS = 1500


@pytest.fixture(scope="module")
def verdicts_and_golden(spark):
    models_bc = broadcast_models(spark)
    pages = pages_spark_df(spark, N_DOCS, seed=42, num_partitions=6)
    verdicts = filter_pages(pages, models_bc, repartition_buckets=8)
    got = verdicts.toPandas().sort_values("url").reset_index(drop=True)
    want = golden_labels(generate_pages_pandas(N_DOCS, seed=42))
    want = want.sort_values("url").reset_index(drop=True)
    assert list(got["url"]) == list(want["url"])
    return got, want


def test_keep_f1(verdicts_and_golden):
    got, want = verdicts_and_golden
    agree = (got["keep"] == want["keep"]).mean()
    f1 = f1_score(got["keep"].astype(bool), want["keep"].astype(bool))
    assert agree == 1.0, f"keep agreement {agree}"
    assert f1 >= 0.99
    # both classes must actually occur for the test to mean anything
    assert 0.5 < want["keep"].mean() < 0.9


def test_scrubbed_text_byte_identical(verdicts_and_golden):
    got, want = verdicts_and_golden
    mismatch = (got["scrubbed_text"] != want["scrubbed_text"]).sum()
    assert mismatch == 0
    assert (got["scrub_count"] == want["scrub_count"]).all()
    assert (want["scrub_count"] > 0).any()  # scrubbing exercised


def test_lang_and_ppl_match(verdicts_and_golden):
    got, want = verdicts_and_golden
    assert (got["lang_pred"] == want["lang_pred"]).all()
    np.testing.assert_allclose(got["ppl"], want["ppl"], rtol=1e-12)


def test_rule_hits_match(verdicts_and_golden):
    got, want = verdicts_and_golden
    for g, w in zip(got["rule_hits"], want["rule_hits"]):
        assert dict(g) == dict(w)


def test_extraction_byte_identity(spark):
    """html → text extraction must reproduce the text column exactly."""
    from pyspark.sql import functions as F

    models_bc = broadcast_models(spark)
    pages = pages_spark_df(spark, 300, seed=42, num_partitions=3)
    extracted = filter_pages(
        pages.withColumnRenamed("text", "text_orig")
        .withColumn("text", F.lit(None).cast("string")),
        models_bc, extract_from_html=True)
    orig = pages.select("url", "text")
    joined = extracted.select("url", F.col("scrubbed_text")).join(orig, "url")
    # scrub(extract(html)) must equal scrub(text)
    want = golden_labels(generate_pages_pandas(300, seed=42))
    got = joined.toPandas().sort_values("url").reset_index(drop=True)
    want = want.sort_values("url").reset_index(drop=True)
    assert (got["scrubbed_text"] == want["scrubbed_text"]).all()


def test_lineage_partitions(spark):
    models_bc = broadcast_models(spark)
    pages = pages_spark_df(spark, 800, seed=42, num_partitions=4)
    verdicts = filter_pages(pages, models_bc, repartition_buckets=8).cache()
    try:
        lin = partition_lineage(verdicts).toPandas()
        assert lin["input_count"].sum() == 800
        assert (lin["keep_count"] + lin["drop_count"] == lin["input_count"]).all()
        assert len(lin) <= 8
        cm = corpus_metrics(verdicts).toPandas()
        assert cm["input_count"].iloc[0] == 800
        assert cm["keep_count"].iloc[0] == lin["keep_count"].sum()
        assert cm["health_status"].iloc[0] in {"Excellent", "Good", "Fair", "Poor"}
        hm = host_metrics_salted(verdicts).toPandas()
        assert hm["n_docs"].sum() == 800
        # Zipf head: hot hosts exist (skew the salting is for)
        assert hm["n_docs"].max() > 40
    finally:
        verdicts.unpersist()


def test_no_row_udfs():
    """Build-contract guard: no per-row Python UDFs anywhere in the
    package (pandas/Arrow UDFs only)."""
    import pathlib
    import re

    pkg = pathlib.Path(__file__).resolve().parents[1] / "datacanary_spark"
    bad = []
    for p in pkg.rglob("*.py"):
        src = p.read_text()
        if re.search(r"(?<!pandas_)\budf\s*\(", src):
            bad.append(str(p))
    assert not bad, f"row-wise udf( found in {bad}"


def test_corpus_metrics_empty_input_health_unknown(spark):
    """Zero verdict rows: health_score is NULL, and health_status must
    surface NULL (unknown) — not fall through the band chain to 'Poor'
    for a corpus that simply has no data."""
    models_bc = broadcast_models(spark)
    pages = pages_spark_df(spark, 10, seed=1).limit(0)
    verdicts = filter_pages(pages, models_bc)
    cm = corpus_metrics(verdicts).collect()[0]
    assert cm["input_count"] == 0
    assert cm["health_score"] is None
    assert cm["health_status"] is None


def test_verdict_and_lineage_match_declared_schemas(spark):
    """schema.py's VERDICT_SCHEMA / LINEAGE_SCHEMA are the declared
    output contracts — the runtime DataFrames must carry exactly those
    column names and datatypes (nullability excluded: Spark's inference
    is plan-dependent), on both the bucketed and unbucketed paths."""
    from datacanary_spark.schema import LINEAGE_SCHEMA, VERDICT_SCHEMA

    models_bc = broadcast_models(spark)
    pages = pages_spark_df(spark, 60, seed=7, num_partitions=2)

    for buckets in (None, 4):
        verdicts = filter_pages(pages, models_bc,
                                repartition_buckets=buckets)
        got = {f.name: f.dataType
               for f in verdicts.schema.fields if f.name != "bucket"}
        want = {f.name: f.dataType for f in VERDICT_SCHEMA.fields}
        assert got == want, f"buckets={buckets}"

        lin = partition_lineage(verdicts)
        got_l = {f.name: f.dataType for f in lin.schema.fields}
        want_l = {f.name: f.dataType for f in LINEAGE_SCHEMA.fields}
        assert got_l == want_l, f"buckets={buckets}"
