"""Shared Spark session for the test suite (local[4], AQE+Arrow on)."""

from __future__ import annotations

import pytest

from datacanary_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="datacanary_spark_tests", master="local[4]",
                  shuffle_partitions=4)
    yield s
