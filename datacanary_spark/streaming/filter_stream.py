"""Structured Streaming front-end for the quality-filter pipeline.

The batch pipeline (plans/pipeline.py) is reused verbatim inside
``foreachBatch`` — one code path for both executions, which is how the
engine ingests a continuously-landing Common-Crawl-style feed:

    readStream(parquet dir / Iceberg incremental)
      → foreachBatch(filter_pages → verdict + lineage parquet,
                     batch_id-partitioned dynamic overwrite)
      → checkpointLocation tracks processed files; the idempotent sink
        upgrades foreachBatch's at-least-once to effective exactly-once

``Trigger.AvailableNow`` drains everything that has landed and stops —
the streaming twin of the chunked batch job (plans/checkpoint.py), with
Spark's own checkpoint/WAL replacing the `_done` manifests. Late data
in the windowed aggregate is bounded by an event-time watermark.

The reference is batch-only (SURVEY.md §2.6: streaming absent); this
module is north-rule scaffolding, oracle-checked indirectly: the
streaming output must equal the batch output over the same input
(tests/test_streaming.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datacanary_spark.functions.heuristics import FilterConfig
from datacanary_spark.plans.lineage import partition_lineage
from datacanary_spark.plans.pipeline import broadcast_models, filter_pages
from datacanary_spark.schema import PAGES_SCHEMA


def run_filter_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    cfg: FilterConfig | None = None,
    max_files_per_trigger: int | None = None,
    input_format: str = "parquet",
) -> None:
    """Drain all available input through the filter once (AvailableNow).

    ``input_format="jsonl"`` streams published-corpus dump files
    instead (same wire schema + projection as the batch
    `sources/io.read_pages_jsonl`, so the two ingest paths cannot
    drift; Spark's file-source checkpoint tracks .jsonl[.gz] files
    exactly like parquet ones).

    Restart-safe: Spark's checkpoint tracks processed files, so re-runs
    after new files land process ONLY the new files (incremental
    ingest). ``foreachBatch`` itself is AT-LEAST-once (a crash between
    the sink write and the checkpoint commit replays the batch on
    restart), so the sink is made idempotent: every output row is
    tagged with its micro-batch id and written as a dynamic overwrite
    of exactly the ``batch_id=N`` partition — a replay rewrites the
    same partition instead of appending duplicates, giving effective
    exactly-once end to end.
    """
    models_bc = broadcast_models(spark)
    verdict_dir = os.path.join(output_dir, "verdicts")
    metrics_dir = os.path.join(output_dir, "metrics")

    if input_format == "jsonl":
        from datacanary_spark.sources.io import (
            JSONL_GLOB,
            PAGES_JSONL_WIRE_SCHEMA,
            pages_from_jsonl_raw,
        )

        reader = spark.readStream.schema(PAGES_JSONL_WIRE_SCHEMA)
    elif input_format == "parquet":
        reader = spark.readStream.schema(PAGES_SCHEMA)
    else:
        raise ValueError(f"unknown input_format {input_format!r} "
                         f"(parquet or jsonl)")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    if input_format == "jsonl":
        # the SHARED glob: "*.json*" would also ingest half-written
        # .tmp uploads the batch chunker deliberately excludes
        pages = pages_from_jsonl_raw(
            reader.option("pathGlobFilter", JSONL_GLOB).json(input_dir))
    else:
        pages = reader.parquet(input_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        verdicts = filter_pages(batch_df, models_bc, cfg=cfg)
        write_batch_outputs(verdicts, batch_id, verdict_dir, metrics_dir)

    (pages.writeStream
          .foreachBatch(process_batch)
          .option("checkpointLocation", checkpoint_dir)
          .trigger(availableNow=True)
          .start()
          .awaitTermination())


def write_batch_outputs(verdicts: DataFrame, batch_id: int,
                        verdict_dir: str, metrics_dir: str) -> None:
    """Idempotent per-micro-batch sink (safe under foreachBatch replay).

    Both sinks are partitioned by ``batch_id`` and written with dynamic
    partition overwrite: writing batch N twice (an at-least-once replay)
    replaces the ``batch_id=N`` directory rather than appending a second
    copy. Downstream readers need no dedup and lineage rows stay keyed
    by the batch that produced them.
    """
    verdicts = verdicts.persist()
    try:
        (verdicts.withColumn("batch_id", F.lit(batch_id))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("batch_id").parquet(verdict_dir))
        (partition_lineage(verdicts)
         .withColumn("batch_id", F.lit(batch_id))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("batch_id").parquet(metrics_dir))
    finally:
        verdicts.unpersist()


def idempotent_parquet_sink(output_dir: str):
    """foreachBatch sink that absorbs at-least-once replays: rows land in
    a ``batch_id=N`` partition via dynamic overwrite, so a replayed batch
    rewrites its partition instead of appending a duplicate copy. Empty
    batches are skipped (a partitioned write of zero rows creates a dir
    with no readable schema, and there is nothing to make idempotent)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        (batch_df.withColumn("batch_id", F.lit(batch_id))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("batch_id").parquet(output_dir))

    return sink


def stream_dedup_pages(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    watermark: str = "24 hours",
):
    """Ingest-time exact dedup over a continuously-landing pages feed.

    ``dropDuplicatesWithinWatermark`` keyed on the normalized content
    fingerprint: the FIRST arrival of a given content survives; later
    copies arriving within the watermark horizon are dropped. This is
    the streaming twin of ``operators/dedup.exact_dedup`` with the state
    contract a 10^12-doc feed needs: the state store holds only
    fingerprints inside the watermark horizon (older ones are evicted),
    not corpus history — recrawl/refetch duplicates, which cluster in
    time, are removed at ingest, and the periodic batch job remains the
    authority for global dedup.

    Documented deviation from the batch operator: the survivor is the
    first ARRIVAL (processing order), not min doc id — that is the only
    survivor a one-pass stream can pick, and it is stable across
    restarts because Spark's checkpoint pins the file processing order.
    """
    from datacanary_spark.operators.text_analysis import content_fingerprint

    pages = spark.readStream.schema(PAGES_SCHEMA).parquet(input_dir)
    keyed = (pages
             .withColumn("fp", content_fingerprint(F.col("text")))
             .withWatermark("warc_ts", watermark))
    # null fingerprint = unknown content (text extraction failed): such
    # pages are EXEMPT from dedup and pass straight through — keying
    # them would make every extraction failure a "duplicate" of the
    # first one and silently drop real pages.
    deduped = (keyed.where(F.col("fp").isNotNull())
               .dropDuplicatesWithinWatermark(["fp"])
               .unionByName(keyed.where(F.col("fp").isNull())))
    return (deduped.writeStream
            .foreachBatch(idempotent_parquet_sink(output_dir))
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def stream_hourly_counts(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    query_name: str = "hourly_counts",
    watermark: str = "2 hours",
):
    """Watermarked tumbling-window count over a streaming events feed.

    Demonstrates late-data semantics: events later than ``watermark``
    behind the max seen ts are dropped from their (closed) window.
    Results land in an in-memory sink table named ``query_name``
    (complete mode — the table is tiny: hours × event types).
    """
    from datacanary_spark.schema import EVENTS_SCHEMA

    events = spark.readStream.schema(EVENTS_SCHEMA).parquet(input_dir)
    agg = (events
           .withWatermark("ts", watermark)
           .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
           .agg(F.count(F.lit(1)).alias("n_events"),
                F.bround(F.avg("value"), 6).alias("avg_value"))
           .select(F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("hour"),
                   "event_type", "n_events", "avg_value"))
    return (agg.writeStream
               .format("memory")
               .queryName(query_name)
               .outputMode("complete")
               .option("checkpointLocation", checkpoint_dir)
               .trigger(availableNow=True)
               .start())


def stream_hourly_counts_append(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    watermark: str = "2 hours",
):
    """Append-mode twin of ``stream_hourly_counts`` with a parquet file
    sink: a window row is emitted ONCE, when the event-time watermark
    passes its end (finalized — safe to consume downstream), and events
    arriving more than ``watermark`` behind the max seen timestamp are
    DROPPED from their already-finalized window instead of mutating it.
    The watermark state lives in the checkpoint, so the late-data
    contract holds across restarts/incremental drains.
    """
    from datacanary_spark.schema import EVENTS_SCHEMA

    events = spark.readStream.schema(EVENTS_SCHEMA).parquet(input_dir)
    agg = (events
           .withWatermark("ts", watermark)
           .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
           .agg(F.count(F.lit(1)).alias("n_events"))
           .select(F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("hour"),
                   "event_type", "n_events"))
    return (agg.writeStream
               .format("parquet")
               .option("path", output_dir)
               .option("checkpointLocation", checkpoint_dir)
               .outputMode("append")
               .trigger(availableNow=True)
               .start())
