"""Streaming front-end for the batch-incremental dedup store.

``foreachBatch`` replay semantics and ``SignatureStore.ingest``'s
commit protocol are a designed fit:

* Structured Streaming assigns monotonically increasing micro-batch
  ids across restarts — exactly the store's batch-precedence contract.
* ``foreachBatch`` is AT-LEAST-once: a crash between the sink write
  and Spark's checkpoint commit replays the batch with the SAME id on
  restart. The store absorbs both crash positions: an uncommitted
  attempt is recomputed (its orphan dirs overwritten), and an
  already-committed batch takes the idempotent path — accepted ids are
  replayed from the store with no recomputation. The accepted-rows
  sink overwrites its own ``batch_id=N`` directory, so the replay
  rewrites rather than duplicates: effective exactly-once end to end,
  with the dedup STATE carried by the store (not Spark's state store,
  so it survives checkpoint deletion and is queryable at rest).

A continuously-crawled corpus therefore runs as: file drops into
``input_dir`` → ``run_ingest_stream`` (cron or always-on) → each new
file set becomes one store batch deduplicated against all of history.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from datacanary_spark.plans.incremental import SignatureStore
from datacanary_spark.sources.io import path_exists


def run_ingest_stream(
    spark: SparkSession,
    input_dir: str,
    store_root: str,
    output_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
    hash_fn: str = "md5",
    max_files_per_trigger: int | None = None,
) -> None:
    """Drain all available input files through the store (AvailableNow).

    The store is created on first use (parameters pinned then); Spark's
    checkpoint tracks which input files each micro-batch consumed, so a
    re-run after new files land ingests ONLY the new files as the next
    batch. Accepted rows land under ``output_dir/batch_id=N/``.
    """
    # Schema inference FIRST — before any store mutation: an empty or
    # not-yet-populated input dir must not pin store parameters as a
    # side effect of a crashed setup run. recursiveFileLookup: input
    # "files" are commonly Spark-written directories themselves (a
    # crawler drop = one parquet dir); flat schema, no partition
    # inference.
    store_exists = path_exists(spark, f"{store_root.rstrip('/')}/meta.json")
    try:
        schema = spark.read.option("recursiveFileLookup", "true") \
            .parquet(input_dir).schema
    except Exception as e:
        # only a missing/empty input dir is the benign "no new drop yet"
        # case; credential failures, corrupt parquet, etc. must surface,
        # not silently report a clean drain on every cron run.
        msg = str(e)
        cls = ""
        get_cls = getattr(e, "getCondition", None) \
            or getattr(e, "getErrorClass", None)
        if callable(get_cls):
            try:
                cls = get_cls() or ""
            except Exception:
                cls = ""
        benign = ("PATH_NOT_FOUND" in cls
                  or "UNABLE_TO_INFER_SCHEMA" in cls
                  or "Path does not exist" in msg
                  or "Unable to infer schema" in msg)
        if store_exists:
            if benign:
                # normal streaming hygiene: consumed files archived, or
                # no new drop yet — nothing to drain
                return
            raise
        raise ValueError(
            f"no readable parquet under {input_dir!r} and the store "
            f"does not exist yet — not creating a store from an empty "
            f"setup run ({e.__class__.__name__})") from e
    if store_exists:
        store = SignatureStore.open(spark, store_root)
    else:
        store = SignatureStore.create(spark, store_root,
                                      threshold=threshold, hash_fn=hash_fn)

    reader = spark.readStream.schema(schema) \
        .option("recursiveFileLookup", "true")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger",
                               str(max_files_per_trigger))
    docs = reader.parquet(input_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        accepted = store.ingest(batch_df, batch_id, id_col=id_col,
                                text_col=text_col)
        accepted.write.mode("overwrite").parquet(
            os.path.join(output_dir, f"batch_id={batch_id}"))

    (docs.writeStream
         .foreachBatch(process_batch)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start()
         .awaitTermination())
