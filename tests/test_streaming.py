"""Structured Streaming tests: the streaming filter must (a) produce
exactly the batch pipeline's verdicts over the same input, and (b)
resume incrementally — a restart after new files land processes ONLY
the new files (checkpoint-driven exactly-once)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from datacanary_spark.plans.pipeline import broadcast_models, filter_pages
from datacanary_spark.sources.fixtures import write_pages_parquet
from datacanary_spark.streaming import run_filter_stream, stream_hourly_counts


@pytest.fixture(scope="module")
def stream_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("stream")
    inp = str(root / "input")
    os.makedirs(inp)
    return {"input": inp, "out": str(root / "out"), "ckpt": str(root / "ckpt")}


def _verdict_map(df):
    return {r["url"]: (r["keep"], r["scrubbed_text"])
            for r in df.select("url", "keep", "scrubbed_text").collect()}


def test_stream_equals_batch_and_resumes(spark, stream_dirs, tmp_path):
    # batch 1: 60 docs land
    write_pages_parquet(stream_dirs["input"], n_docs=60, seed=42, start_id=0)
    run_filter_stream(spark, stream_dirs["input"], stream_dirs["out"],
                      stream_dirs["ckpt"])
    v1 = spark.read.parquet(os.path.join(stream_dirs["out"], "verdicts"))
    assert v1.count() == 60

    # batch 2: 40 more docs land; restart drains ONLY the delta
    write_pages_parquet(stream_dirs["input"], n_docs=40, seed=42, start_id=1000)
    run_filter_stream(spark, stream_dirs["input"], stream_dirs["out"],
                      stream_dirs["ckpt"])
    v2 = spark.read.parquet(os.path.join(stream_dirs["out"], "verdicts"))
    assert v2.count() == 100  # no reprocessing of batch 1

    # streaming output == batch pipeline over the same input —
    # byte-identical on EVERY verdict column (keep decision, scrubbed
    # text, model scores, per-rule hits), not just a row count: both
    # paths run the identical filter_pages plan, so any divergence is
    # a bug, not float noise
    from datacanary_spark.plans.pipeline import VERDICT_COLUMNS

    pages = spark.read.parquet(stream_dirs["input"])
    batch = filter_pages(pages, broadcast_models(spark))

    def full_map(df):
        rows = df.select(*VERDICT_COLUMNS).collect()
        return {r["url"]: tuple(
            sorted(r[c].items()) if isinstance(r[c], dict) else r[c]
            for c in VERDICT_COLUMNS) for r in rows}

    assert full_map(v2) == full_map(batch)

    # lineage/metrics rows landed per micro-batch
    metrics = spark.read.parquet(os.path.join(stream_dirs["out"], "metrics"))
    assert metrics.agg(F.sum("input_count")).collect()[0][0] == 100
    assert metrics.select("batch_id").distinct().count() >= 2


def test_stream_windowed_counts_matches_batch(spark, tmp_path):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    inp = str(tmp_path / "ev")
    events.write.parquet(inp)

    q = stream_hourly_counts(spark, inp, str(tmp_path / "ckpt"),
                             query_name="hourly_test")
    q.awaitTermination()
    got = {(r["hour"], r["event_type"]): (r["n_events"], r["avg_value"])
           for r in spark.sql("select * from hourly_test").collect()}

    exp_df = (events.groupBy(
                  F.date_format(F.date_trunc("hour", F.col("ts").cast("timestamp")),
                                "yyyy-MM-dd HH:mm:ss").alias("hour"),
                  "event_type")
              .agg(F.count(F.lit(1)).alias("n"),
                   F.bround(F.avg("value"), 6).alias("v")))
    exp = {(r["hour"], r["event_type"]): (r["n"], r["v"]) for r in exp_df.collect()}
    assert got == exp


def test_batch_sink_idempotent_on_replay(spark, tmp_path):
    """foreachBatch is at-least-once: a crash between the sink write and
    the checkpoint commit replays the micro-batch. The sink must absorb
    the replay (dynamic overwrite of the batch_id partition), not append
    a duplicate copy."""
    from datacanary_spark.streaming.filter_stream import write_batch_outputs

    write_pages_parquet(str(tmp_path / "in"), n_docs=20, seed=7, start_id=0)
    pages = spark.read.parquet(str(tmp_path / "in"))
    verdicts = filter_pages(pages, broadcast_models(spark))
    vdir, mdir = str(tmp_path / "v"), str(tmp_path / "m")

    write_batch_outputs(verdicts, 0, vdir, mdir)
    write_batch_outputs(verdicts, 0, vdir, mdir)  # replay of the same batch
    got = spark.read.parquet(vdir)
    assert got.count() == 20
    assert got.select("batch_id").distinct().collect()[0][0] == 0
    m = spark.read.parquet(mdir)
    assert m.agg(F.sum("input_count")).collect()[0][0] == 20

    # a genuinely new batch still lands alongside
    write_batch_outputs(verdicts, 1, vdir, mdir)
    assert spark.read.parquet(vdir).count() == 40


def test_stream_dedup_drops_recrawls_across_restarts(spark, tmp_path):
    """Ingest-time exact dedup: the first arrival of a given content
    fingerprint survives; copies arriving later (same drain or a later
    restart, within the watermark horizon) are dropped. Fingerprint
    state must live in the checkpoint, not the process."""
    import datetime as dt
    import glob
    import shutil

    from datacanary_spark.streaming.filter_stream import stream_dedup_pages

    inp, out, ckpt, tmp = (str(tmp_path / d)
                           for d in ("in", "out", "ckpt", "stage"))
    os.makedirs(inp)
    schema = ("url: string, warc_ts: timestamp, html: binary, "
              "text: string, lang: string")

    def ts(h, m):
        return dt.datetime(2024, 1, 1, h, m)

    def drain(rows, name):
        staged = os.path.join(tmp, name)
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(staged)
        shutil.copy(glob.glob(os.path.join(staged, "part-*.parquet"))[0],
                    os.path.join(inp, name + ".parquet"))
        stream_dedup_pages(spark, inp, out, ckpt,
                           watermark="2 hours").awaitTermination()
        return spark.read.parquet(out)

    # drain 1: two distinct docs + an in-batch recrawl of the first
    # (different url, same content) -> 2 survivors
    got = drain([("http://a.example/1", ts(10, 0), None, "alpha body", "en"),
                 ("http://b.example/1", ts(10, 5), None, "beta body", "en"),
                 ("http://c.example/1", ts(10, 10), None, "alpha body", "en")],
                "f1")
    assert got.count() == 2
    assert got.select("fp").distinct().count() == 2

    # drain 2 (restart, same checkpoint): a recrawl of "alpha body" is
    # dropped by state carried ACROSS the restart; new content is kept
    got = drain([("http://d.example/1", ts(11, 0), None, "alpha body", "en"),
                 ("http://e.example/1", ts(11, 5), None, "gamma body", "en")],
                "f2")
    assert got.count() == 3
    urls = {r["url"] for r in got.select("url").collect()}
    assert "http://e.example/1" in urls
    assert "http://d.example/1" not in urls
    # whitespace-mutated copy ("alpha  body") also collapses: the key is
    # the NORMALIZED content fingerprint, not the raw bytes
    got = drain([("http://f.example/1", ts(11, 30), None, "alpha  body", "en")],
                "f3")
    assert got.count() == 3

    # null-text pages (extraction failures) are EXEMPT: unknown content
    # must never dedup against other unknown content — both pass through
    got = drain([("http://g.example/1", ts(11, 40), None, None, "en"),
                 ("http://h.example/1", ts(11, 45), None, None, "en")],
                "f4")
    assert got.count() == 5
    assert got.where(F.col("text").isNull()).count() == 2


def test_append_mode_drops_late_events(spark, tmp_path):
    """Watermark late-data contract: an event arriving behind the
    watermark must NOT resurrect or mutate its already-finalized window,
    and each window is emitted exactly once (append mode + file sink).
    AvailableNow runs a no-data flush batch, so a window whose end the
    watermark passed is emitted within the same drain."""
    import datetime as dt
    import glob
    import shutil

    from datacanary_spark.streaming import stream_hourly_counts_append

    def ts(h, m=0):
        return dt.datetime(2024, 1, 1, h, m)

    inp, out, ckpt, tmp = (str(tmp_path / d)
                           for d in ("in", "out", "ckpt", "stage"))
    os.makedirs(inp)
    schema = ("event_id: long, ts: timestamp, user_id: long, "
              "event_type: string, value: double, props: string")

    def drain(rows, name):
        # the file stream source lists FILES under the input dir (it
        # does not recurse), so land each batch as one flat parquet file
        staged = os.path.join(tmp, name)
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(staged)
        shutil.copy(glob.glob(os.path.join(staged, "part-*.parquet"))[0],
                    os.path.join(inp, name + ".parquet"))
        stream_hourly_counts_append(spark, inp, out, ckpt).awaitTermination()
        return {(r["hour"], r["n_events"])
                for r in spark.read.parquet(out).collect()}

    # drain 1: hour-10 events + 13:00 -> watermark 11:00 finalizes [10,11)
    rows1 = drain([(1, ts(10, 0), 1, "view", 1.0, None),
                   (2, ts(10, 30), 1, "view", 1.0, None),
                   (3, ts(13, 0), 1, "view", 1.0, None)], "f1")
    assert rows1 == {("2024-01-01 10:00:00", 2)}

    # drain 2: LATE event for hour 9 (4h behind the max ts, behind the
    # 11:00 checkpointed watermark -> dropped) + 17:00 -> watermark
    # 15:00 finalizes [13,14); hour 9 must never appear, hour 10 must
    # not be re-emitted or mutated
    rows2 = drain([(4, ts(9, 0), 1, "view", 1.0, None),
                   (5, ts(17, 0), 1, "view", 1.0, None)], "f2")
    assert rows2 == {("2024-01-01 10:00:00", 2),
                     ("2024-01-01 13:00:00", 1)}
