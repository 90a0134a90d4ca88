"""Profiler parity tests.

Ports the reference's analyser fixture and assertions
(/root/reference/src/tests/test_statistical_analyser.py:18-24 fixture,
:38-59 expected values) onto the Spark profiler.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import types as T

from datacanary_spark.operators.profiler import analyse_dataframe


@pytest.fixture(scope="module")
def fixture_df(spark):
    schema = T.StructType([
        T.StructField("numeric_col", T.DoubleType(), True),
        T.StructField("string_col", T.StringType(), True),
        T.StructField("date_col", T.TimestampType(), True),
        T.StructField("all_null_col", T.StringType(), True),
    ])
    ts = lambda s: dt.datetime.fromisoformat(s)
    rows = [
        (1.0, "a", ts("2023-01-01"), None),
        (2.0, "b", ts("2023-01-02"), None),
        (3.0, "c", ts("2023-01-03"), None),
        (4.0, "a", ts("2023-01-01"), None),
        (5.0, "", ts("2023-02-01"), None),
        (None, None, None, None),
        (0.0, "xyz", ts("2023-03-01"), None),
        (-1.0, "abc", ts("2023-04-01"), None),
    ]
    return spark.createDataFrame(rows, schema)


@pytest.fixture(scope="module")
def profile(fixture_df):
    return analyse_dataframe(fixture_df)


def test_numeric_stats(profile):
    s = profile["numeric_col"]["stats"]
    assert s["count"] == 8
    assert s["null_count"] == 1
    assert s["null_percentage"] == 12.5
    assert s["min"] == -1.0
    assert s["max"] == 5.0
    assert s["mean"] == 2.0
    assert s["median"] == 2.0
    assert s["zeros_count"] == 1
    assert s["negative_count"] == 1
    assert s["unique_count"] == 7
    # sample stddev over [1,2,3,4,5,0,-1]
    assert abs(s["std_dev"] - 2.160246899469287) < 1e-12


def test_string_stats(profile):
    s = profile["string_col"]["stats"]
    assert s["null_count"] == 1
    assert s["unique_count"] == 6  # 'a','b','c','','xyz','abc'
    assert s["empty_string_count"] == 1
    assert s["min_length"] == 0
    assert s["max_length"] == 3
    assert s["has_duplicates"] is True


def test_date_stats(profile):
    s = profile["date_col"]["stats"]
    assert s["null_count"] == 1
    assert s["unique_count"] == 6
    assert s["min_date"] == "2023-01-01 00:00:00"
    assert s["max_date"] == "2023-04-01 00:00:00"
    assert s["range_days"] == 90


def test_all_null_col(profile):
    s = profile["all_null_col"]["stats"]
    assert s["count"] == 8
    assert s["null_count"] == 8
    assert s["null_percentage"] == 100.0
    assert s["unique_count"] == 0
    assert s["unique_percentage"] == 0.0
    # pandas duplicated().any() counts repeated nulls as dups
    assert s["has_duplicates"] is True


def test_empty_columns(spark):
    assert analyse_dataframe(spark.createDataFrame([], T.StructType([]))) == {}


def test_single_row_stddev_zero(spark):
    df = spark.createDataFrame([(3.0,)], T.StructType(
        [T.StructField("x", T.DoubleType())]))
    assert analyse_dataframe(df)["x"]["stats"]["std_dev"] == 0.0


def test_bround_banker_rounding(spark):
    """pandas round() is half-even; 1/16 nulls = 6.25% stays 6.25 but a
    half-at-2dp case must round to even (SURVEY.md §7 hard-part 1)."""
    rows = [(float(i),) for i in range(7)] + [(None,)] * 1
    df = spark.createDataFrame(rows, T.StructType(
        [T.StructField("x", T.DoubleType(), True)]))
    s = analyse_dataframe(df)["x"]["stats"]
    assert s["null_percentage"] == 12.5


# ---------------------------------------------------------------------------
# approx (scale) mode: bounded aggregation state — VERDICT r01 item 4
# ---------------------------------------------------------------------------

def test_approx_mode_plans_bounded_state(fixture_df):
    """The approx=True plan must contain NO unbounded aggregation state:
    no exact percentile (unbounded value buffer on high-cardinality
    doubles) and no collect_set (state grows with distinct count)."""
    from datacanary_spark.operators.profiler import profile_exprs

    agg = fixture_df.agg(*profile_exprs(fixture_df, approx=True))
    plan = agg._jdf.queryExecution().optimizedPlan().toString()
    assert "collect_set" not in plan
    assert "approx_percentile" in plan
    # exact percentile appears only as part of 'approx_percentile'
    assert plan.count("percentile(") == plan.count("approx_percentile(")


def test_approx_mode_values(fixture_df):
    """Approx mode stays correct on small data: HLL++/sketches are exact
    at this cardinality; the sample picks are real column values."""
    p = analyse_dataframe(fixture_df, approx=True)
    num = p["numeric_col"]["stats"]
    assert num["median"] == 2.0  # sketch is exact on 7 values
    assert num["unique_count"] == 7
    s = p["string_col"]["stats"]
    samples = s["sample_values"]
    assert 1 <= len(samples) <= 10
    assert samples == sorted(samples)
    assert set(samples) <= {"a", "b", "c", "", "xyz", "abc"}
    # all-null column: no picks survive -> empty array, never nulls
    assert p["all_null_col"]["stats"]["sample_values"] == []


def test_approx_sample_deterministic(fixture_df):
    """Salted min-by-hash picks are a pure function of the values —
    identical across runs and partitionings."""
    a = analyse_dataframe(fixture_df, approx=True)
    b = analyse_dataframe(fixture_df.repartition(7), approx=True)
    assert (a["string_col"]["stats"]["sample_values"]
            == b["string_col"]["stats"]["sample_values"])


def test_decimal_column_profile(spark):
    """DecimalType columns profile through the numeric branch (cast to
    double for stats) and report the reference's float64 dtype name."""
    from decimal import Decimal

    df = spark.createDataFrame(
        [(Decimal("1.50"),), (Decimal("2.25"),), (Decimal("4.00"),),
         (None,)],
        T.StructType([T.StructField("price", T.DecimalType(10, 2), True)]))
    p = analyse_dataframe(df)["price"]
    assert p["type"] == "float64"
    s = p["stats"]
    assert s["min"] == 1.5 and s["max"] == 4.0
    assert s["median"] == 2.25
    assert s["null_count"] == 1 and s["unique_count"] == 3


def test_column_name_prefix_collision(spark):
    """A column literally named 'x__y' next to a column 'x' must not
    leak its stats into x's dict (stat keys are assigned by LONGEST
    column prefix, not first startswith match)."""
    df = spark.createDataFrame(
        [("a", 1), ("b", 2), ("b", 3)],
        T.StructType([T.StructField("user", T.StringType(), True),
                      T.StructField("user__id", T.LongType(), True)]))
    p = analyse_dataframe(df)
    assert set(p) == {"user", "user__id"}
    # no key from user__id may appear under user
    assert not any(k.startswith("id__") for k in p["user"]["stats"])
    assert p["user"]["stats"]["unique_count"] == 2
    assert p["user__id"]["stats"]["unique_count"] == 3
    assert p["user__id"]["stats"]["min"] == 1.0


def test_approx_all_unique_not_flagged_duplicated(spark):
    """approx mode: has_duplicates uses a 3·rsd guard band over the HLL
    estimate, so an all-unique column must never be flagged just
    because the sketch undershoots the true cardinality."""
    df = spark.range(50_000).withColumnRenamed("id", "uid")
    s = analyse_dataframe(df, approx=True)["uid"]["stats"]
    assert s["has_duplicates"] is False
    # and a heavily-duplicated column still IS flagged in approx mode
    dup = spark.range(50_000).selectExpr("id % 100 as k")
    assert analyse_dataframe(dup, approx=True)["k"]["stats"][
        "has_duplicates"] is True
