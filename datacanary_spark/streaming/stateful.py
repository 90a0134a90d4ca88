"""Custom stateful streaming operator via ``applyInPandasWithState``.

Running per-host ingest accounting for the crawl feed: state = (docs
seen, docs kept) per host across ALL micro-batches; each batch emits the
updated cumulative row for hosts touched in that batch. This is the
engine's example of arbitrary stateful processing — the shape real
pipelines use for per-host rate limiting / quota tracking — kept
deliberately small so the state schema, timeout handling, and
batch-accumulation mechanics are easy to verify against the batch twin.

State lives in Spark's state store under the stream checkpoint: restart
the query and counts continue from where they stopped (exercised in
tests/test_streaming_stateful.py via two sequential AvailableNow drains).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from datacanary_spark.schema import PAGES_SCHEMA

OUTPUT_SCHEMA = T.StructType([
    T.StructField("host", T.StringType(), False),
    T.StructField("docs_seen", T.LongType(), False),
    T.StructField("docs_kept", T.LongType(), False),
])

STATE_SCHEMA = T.StructType([
    T.StructField("docs_seen", T.LongType(), False),
    T.StructField("docs_kept", T.LongType(), False),
])


def _update_host(key: tuple, pdfs: Iterable[pd.DataFrame],
                 state: GroupState) -> Iterable[pd.DataFrame]:
    seen, kept = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        seen += len(pdf)
        kept += int(pdf["keep"].sum())
    state.update((seen, kept))
    yield pd.DataFrame({"host": [key[0]], "docs_seen": [seen],
                        "docs_kept": [kept]})


def host_quota_stream(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    output_dir: str,
    min_words: int = 50,
):
    """Cumulative per-host (seen, kept) counts over a streaming pages feed.

    ``keep`` here is a cheap single heuristic (word count ≥ min_words) —
    the full verdict pipeline stays in foreachBatch (filter_stream.py);
    this operator demonstrates the custom-state path. Updates land in
    ``output_dir`` as append-only parquet via foreachBatch (the memory
    sink cannot recover from a checkpoint; a durable sink is required
    for the restart semantics this operator exists to provide).
    """
    pages = spark.readStream.schema(PAGES_SCHEMA).parquet(input_dir)
    words = F.filter(F.split(F.col("text"), r"\s+"), lambda w: w != F.lit(""))
    enriched = pages.select(
        F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
        (F.size(words) >= min_words).alias("keep"))
    updated = enriched.groupBy("host").applyInPandasWithState(
        _update_host,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

    def sink(batch_df, batch_id: int) -> None:
        (batch_df.withColumn("batch_id", F.lit(batch_id))
         .write.mode("append").parquet(output_dir))

    return (updated.writeStream
            .foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())
