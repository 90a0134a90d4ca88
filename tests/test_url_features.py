"""URL-structure feature expressions (text_analysis.url_features)."""

from __future__ import annotations

import math

from datacanary_spark.operators.text_analysis import url_features


def _feat(spark, url):
    df = spark.createDataFrame([(url, "en")], "url string, lang string")
    return url_features(df).collect()[0]


def test_depth_params_labels_and_digits(spark):
    r = _feat(spark, "https://www.sub.h3.example/a1/bb/c22?x=1&y=2&z=3")
    assert r.path_depth == 3
    assert r.n_params == 3
    assert r.n_host_labels == 4
    # digits: 1,2,2 = 3 over len("/a1/bb/c22") = 10
    assert math.isclose(r.digit_frac, 3 / 10, rel_tol=1e-12)
    assert r.is_index is False
    assert r.url_len == len("https://www.sub.h3.example/a1/bb/c22?x=1&y=2&z=3")
    assert r.lang == "en"  # passthrough


def test_root_and_index_pages(spark):
    assert _feat(spark, "https://h.example/").is_index is True
    assert _feat(spark, "https://h.example/index.html").is_index is True
    assert _feat(spark, "https://h.example/index.php").is_index is True
    assert _feat(spark, "https://h.example/indexing").is_index is False
    r = _feat(spark, "https://h.example/")
    assert r.path_depth == 0 and r.n_params == 0 and r.digit_frac == 0.0


def test_malformed_and_null_urls_get_null_features(spark):
    r = _feat(spark, "not a url")
    assert r.n_params is None and r.digit_frac is None
    df = spark.createDataFrame([(None, "en")], "url string, lang string")
    r2 = url_features(df).collect()[0]
    assert r2.path_depth is None and r2.url_len is None


def test_plan_is_expression_only_no_shuffle(spark):
    df = spark.createDataFrame([("https://h.example/a", "en")],
                               "url string, lang string")
    plan = url_features(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "Exchange" not in plan
