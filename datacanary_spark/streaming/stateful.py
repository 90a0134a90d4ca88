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

from datacanary_spark.functions.heuristics import words_expr
from datacanary_spark.schema import PAGES_SCHEMA
from datacanary_spark.streaming.filter_stream import (
    idempotent_parquet_sink as _idempotent_sink,
)

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


SESSION_OUTPUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType(), False),
    T.StructField("session_start", T.TimestampType(), False),
    T.StructField("session_end", T.TimestampType(), False),
    T.StructField("n_events", T.LongType(), False),
])

# open session carried between micro-batches
SESSION_STATE_SCHEMA = T.StructType([
    T.StructField("start_us", T.LongType(), False),
    T.StructField("last_us", T.LongType(), False),
    T.StructField("n_events", T.LongType(), False),
])

_US = 1_000_000


def _make_session_fn(gap_s: int):
    import datetime as _dt

    def to_ts(us: int):
        return _dt.datetime.fromtimestamp(us / _US, tz=_dt.timezone.utc) \
            .replace(tzinfo=None)

    def update(key: tuple, pdfs: Iterable[pd.DataFrame],
               state: GroupState) -> Iterable[pd.DataFrame]:
        closed: list[tuple] = []
        if state.hasTimedOut:
            # watermark passed the open session's gap: emit and clear
            start_us, last_us, n = state.get
            closed.append((key[0], to_ts(start_us), to_ts(last_us), n))
            state.remove()
        else:
            # INTERVAL MERGE, not a forward-only fold: an admitted event
            # may be event-time-older than the carried session's start
            # (it only has to beat the watermark), so the open state is
            # treated as one interval among the batch's events and all
            # are merged in start order — a retrograde event within the
            # gap correctly extends the session backward, and one beyond
            # the gap becomes its own (earlier) session instead of being
            # silently swallowed into a later one.
            intervals: list[list] = [[int(v), int(v), 1]
                                     for pdf in pdfs for v in pdf["ts_us"]]
            if state.exists:
                intervals.append(list(state.get))
            intervals.sort(key=lambda iv: (iv[0], iv[1]))
            cur = None
            for start, end, n in intervals:
                if cur is None:
                    cur = [start, end, n]
                elif start - cur[1] > gap_s * _US:
                    closed.append((key[0], to_ts(cur[0]), to_ts(cur[1]), cur[2]))
                    cur = [start, end, n]
                else:
                    cur[1] = max(cur[1], end)
                    cur[2] += n
            if cur is not None:
                state.update(tuple(cur))
                # close the open session once event time passes last+gap
                state.setTimeoutTimestamp(cur[1] // 1000 + gap_s * 1000)
        if closed:
            yield pd.DataFrame(closed, columns=["user_id", "session_start",
                                                "session_end", "n_events"])

    return update


def session_window_stream(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    output_dir: str,
    gap_s: int = 1800,
    watermark: str = "0 seconds",
):
    """Gap-based session windows over a streaming events feed —
    arbitrary stateful processing with EVENT-TIME timeouts: a user's
    session closes either when a later event arrives past the gap, or
    when the stream's watermark passes session_end + gap (so idle users'
    sessions still get emitted). Late events beyond the watermark are
    dropped by Spark before reaching the operator.
    """
    from datacanary_spark.schema import EVENTS_SCHEMA

    events = (spark.readStream.schema(EVENTS_SCHEMA).parquet(input_dir)
              .withColumn("ts", F.col("ts").cast("timestamp"))
              .withWatermark("ts", watermark)
              .withColumn("ts_us", F.unix_micros("ts"))
              .select("user_id", "ts", "ts_us"))
    sessions = events.groupBy("user_id").applyInPandasWithState(
        _make_session_fn(gap_s),
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )

    return (sessions.writeStream
            .foreachBatch(_idempotent_sink(output_dir))
            .outputMode("append")
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


try:  # Spark 4 successor stateful API (guard keeps import-time light)
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor as _StatefulProcessor,
    )
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessorHandle as _StatefulProcessorHandle,
    )
except ImportError:  # pragma: no cover - older pyspark
    _StatefulProcessor = object
    _StatefulProcessorHandle = object


class HostQuotaProcessor(_StatefulProcessor):
    """Cumulative (docs_seen, docs_kept) per host as a Spark 4
    ``StatefulProcessor``: state is a named ValueState with optional
    TTL. Module-level so the processor logic is unit-testable against
    a fake handle without a streaming query."""

    def __init__(self, state_ttl_ms: int | None = None):
        self._ttl = state_ttl_ms

    def init(self, handle) -> None:
        self._counts = handle.getValueState(
            "counts", STATE_SCHEMA, ttlDurationMs=self._ttl)

    def handleInputRows(self, key, rows, timer_values):
        prev = self._counts.get() if self._counts.exists() else (0, 0)
        seen, kept = int(prev[0]), int(prev[1])
        for pdf in rows:
            seen += len(pdf)
            kept += int(pdf["keep"].sum())
        self._counts.update((seen, kept))
        yield pd.DataFrame({"host": [key[0]], "docs_seen": [seen],
                            "docs_kept": [kept]})

    def close(self) -> None:
        pass


def _enriched_pages_stream(spark: SparkSession, input_dir: str,
                           min_words: int):
    """(host, keep) streaming projection shared by both stateful APIs."""
    pages = spark.readStream.schema(PAGES_SCHEMA).parquet(input_dir)
    # single source of truth for the tokenization contract (pinned to
    # the golden twin via functions/heuristics.py)
    words = words_expr(F.col("text"))
    return pages.select(
        F.try_parse_url(F.col("url"), F.lit("HOST")).alias("host"),
        (F.size(words) >= min_words).alias("keep"))


def _tws_time_mode(state_ttl_ms: int | None) -> str:
    """Spark 4 rejects a state TTL under ``timeMode="None"``
    (STATEFUL_PROCESSOR_INCORRECT_TIME_MODE_TO_ASSIGN_TTL): TTL is
    evaluated against processing time, so requesting one requires
    that time mode."""
    return "ProcessingTime" if state_ttl_ms is not None else "None"


def host_quota_stream_tws(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    output_dir: str,
    min_words: int = 50,
    state_ttl_ms: int | None = None,
):
    """The same cumulative per-host accounting on Spark 4's
    ``transformWithStateInPandas`` (the successor API to
    ``applyInPandasWithState``): state is a named ``ValueState`` on a
    ``StatefulProcessor`` handle instead of one opaque tuple, which
    buys composable state variables (value/list/map), per-state TTL
    (``state_ttl_ms`` — the bounded-state story for hosts never seen
    again), and timers — without changing the operator's semantics.
    Output and restart behavior are identical to ``host_quota_stream``
    (asserted against the same batch twin when runnable).

    Sandbox note: the TWS Python↔JVM state protocol requires the
    ``protobuf`` package in the worker; this environment lacks it, so
    the end-to-end test self-skips there and the processor LOGIC is
    unit-tested against a fake handle instead (the same gating pattern
    as functions/model_adapters). On a normally-provisioned cluster
    this runs as-is.
    """
    enriched = _enriched_pages_stream(spark, input_dir, min_words)
    updated = enriched.groupBy("host").transformWithStateInPandas(
        statefulProcessor=HostQuotaProcessor(state_ttl_ms),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode=_tws_time_mode(state_ttl_ms),
    )
    return (updated.writeStream
            .foreachBatch(_idempotent_sink(output_dir))
            .outputMode("update")
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


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
    See :func:`host_quota_stream_tws` for the same operator on Spark
    4's transformWithStateInPandas API.
    """
    enriched = _enriched_pages_stream(spark, input_dir, min_words)
    updated = enriched.groupBy("host").applyInPandasWithState(
        _update_host,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

    return (updated.writeStream
            .foreachBatch(_idempotent_sink(output_dir))
            .outputMode("update")
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())
