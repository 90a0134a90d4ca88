"""Partition-count hygiene for compute-heavy map stages.

A small parquet table often scans as ONE split (a single row group
cannot be subdivided by ``files.maxPartitionBytes``), which silently
serializes every downstream map-heavy stage — MinHash signatures,
winnowing fingerprints, nested-loop pair scoring — onto one core no
matter how many the session has. Measured on the LSH candidate stage:
local[2] and local[8] both took ~30 s on the same 6k-doc corpus until
the input was spread.

``spread_to_parallelism`` round-robins the frame up to
``defaultParallelism`` ONLY when the source has fewer partitions: at
real scale (100 TB = thousands of splits) it is a no-op with zero added
shuffle; at test scale it is one narrow exchange of the input rows that
unlocks every core. Operators call it at the point where per-row work
becomes expensive (before hashing/scoring), never after a shuffle —
post-shuffle stages already have ``spark.sql.shuffle.partitions``
tasks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_to_parallelism(df: DataFrame) -> DataFrame:
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df
