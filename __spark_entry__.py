"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Queries are defined in ``datacanary_spark.entry_queries`` (kept there so
the package stays importable as a library and this file stays a thin
contract shim).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from datacanary_spark import entry_queries as _eq


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: heuristic quality-filter verdict counts by language over
    the sf0.001 documents table."""
    return _eq.flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _eq.QUERIES


def oracle_sql() -> dict[str, str]:
    return _eq.ORACLE_SQL
