"""MAD (median absolute deviation) — exact grouped-agg UDAF vs the
bounded-state approx composition.

The exact UDAF (functions/udfs.py::make_mad_udaf) buffers one whole
group per invocation — correct and oracle-exact, but only safe for
bounded groups. ``mad_approx`` is the 10^12-row path: two
percentile_approx sketches with O(accuracy) state per group. These
tests pin (a) agreement between the two at fixture scale and (b) the
bounded-state plan shape of the approx path.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from datacanary_spark.functions.udfs import mad_approx, make_mad_udaf


def _fixture_df(spark, n_per_group=301):
    # odd group size → numpy's interpolated median equals the discrete
    # median percentile_approx returns, so exact/approx must agree
    # exactly (even sizes differ by at most one inter-element gap)
    rng = np.random.default_rng(7)
    rows = []
    for g in ("en", "de", "fr"):
        vals = rng.normal(loc=len(g) * 100.0, scale=25.0, size=n_per_group)
        rows += [(g, float(v)) for v in vals]
    return spark.createDataFrame(rows, "lang: string, v: double")


def test_mad_approx_agrees_with_exact_udaf(spark):
    df = _fixture_df(spark)
    mad = make_mad_udaf()
    exact = {r["lang"]: r["mad"] for r in
             df.groupBy("lang").agg(mad("v").alias("mad")).collect()}
    approx = {r["lang"]: r["mad"] for r in
              mad_approx(df, "v", ["lang"], accuracy=10000).collect()}
    assert set(exact) == set(approx)
    for g in exact:
        # accuracy >> group size → both medians are the discrete ones;
        # tolerance covers the double-arithmetic paths differing
        assert approx[g] == pytest.approx(exact[g], rel=1e-9), g


def test_mad_approx_python_and_null_semantics(spark):
    # null values are ignored by both implementations; an all-null
    # group yields null MAD either way
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", None), ("a", 9.0),
         ("b", None)],
        "lang: string, v: double")
    mad = make_mad_udaf()
    exact = {r["lang"]: r["mad"] for r in
             df.groupBy("lang").agg(mad("v").alias("mad")).collect()}
    approx = {r["lang"]: r["mad"] for r in
              mad_approx(df, "v", ["lang"]).collect()}
    assert exact["b"] is None and approx["b"] is None
    assert approx["a"] == pytest.approx(exact["a"], rel=1e-9)


def test_mad_approx_null_group_key_survives(spark):
    """A NULL group key is a real group: the exact UDAF (groupBy) emits
    a MAD row for it, so the approx path's medians join-back must be
    null-safe — an equality join would silently drop every null-keyed
    row (ADVICE r03)."""
    df = spark.createDataFrame(
        [(None, 1.0), (None, 2.0), (None, 10.0),
         ("a", 4.0), ("a", 6.0), ("a", 5.0)],
        "lang: string, v: double")
    mad = make_mad_udaf()
    exact = {r["lang"]: r["mad"] for r in
             df.groupBy("lang").agg(mad("v").alias("mad")).collect()}
    approx = {r["lang"]: r["mad"] for r in
              mad_approx(df, "v", ["lang"]).collect()}
    assert set(approx) == {None, "a"} == set(exact)
    assert approx[None] == pytest.approx(exact[None], rel=1e-9)
    assert approx["a"] == pytest.approx(exact["a"], rel=1e-9)


def test_mad_approx_plan_is_bounded_state(spark):
    """The scale path must contain NO pandas aggregation (whole-group
    buffering) — only approx-percentile hash aggregates — and reuse the
    group-key partitioning rather than a cartesian/nested-loop join."""
    df = _fixture_df(spark, n_per_group=11)
    plan = mad_approx(df, "v", ["lang"])._jdf.queryExecution() \
        .executedPlan().toString()
    assert "AggregateInPandas" not in plan
    assert "FlatMapGroupsInPandas" not in plan
    assert "percentile_approx" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
