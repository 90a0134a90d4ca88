"""applyInPandasWithState: cumulative per-host counts must survive a
stream restart (state store under the checkpoint) and match the batch
twin over the union of all drops."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from datacanary_spark.sources.fixtures import write_pages_parquet
from datacanary_spark.streaming.stateful import host_quota_stream


@pytest.fixture(scope="module")
def dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("stateful")
    inp = str(root / "input")
    os.makedirs(inp)
    return {"input": inp, "ckpt": str(root / "ckpt"), "out": str(root / "out")}


def _batch_twin(spark, input_dir, min_words=50):
    pages = spark.read.parquet(input_dir)
    words = F.filter(F.split(F.col("text"), r"\s+"), lambda w: w != F.lit(""))
    return {
        r["host"]: (r["seen"], r["kept"])
        for r in pages.select(
            F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
            (F.size(words) >= min_words).alias("keep"))
        .groupBy("host")
        .agg(F.count(F.lit(1)).alias("seen"),
             F.sum(F.col("keep").cast("long")).alias("kept"))
        .collect()
    }


def _latest_from_sink(spark, out_dir, min_batch: int = -1):
    # append-only updates: one row per (batch, host); cumulative counts
    # are monotone, so the max per host is the latest state
    rows = spark.read.parquet(out_dir).where(
        F.col("batch_id") >= min_batch).collect()
    out = {}
    for r in rows:
        cur = out.get(r["host"], (0, 0))
        out[r["host"]] = max(cur, (r["docs_seen"], r["docs_kept"]))
    return out


def test_state_accumulates_across_restarts(spark, dirs):
    write_pages_parquet(dirs["input"], n_docs=80, seed=42, start_id=0)
    q = host_quota_stream(spark, dirs["input"], dirs["ckpt"], dirs["out"])
    q.awaitTermination()
    assert _latest_from_sink(spark, dirs["out"]) == _batch_twin(spark, dirs["input"])

    # second drop; NEW query instance, same checkpoint → state restored
    write_pages_parquet(dirs["input"], n_docs=60, seed=42, start_id=5000)
    q2 = host_quota_stream(spark, dirs["input"], dirs["ckpt"], dirs["out"])
    q2.awaitTermination()
    latest = _latest_from_sink(spark, dirs["out"])
    expected = _batch_twin(spark, dirs["input"])
    # batch 2 only re-emits hosts it touched, but their counts must be
    # CUMULATIVE over both drops (state survived the restart)
    assert latest == expected
    total_seen = sum(v[0] for v in expected.values())
    assert total_seen == 140


def _protobuf_available() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(not _protobuf_available(),
                    reason="transformWithStateInPandas worker protocol "
                           "needs protobuf (absent in this sandbox)")
def test_tws_state_accumulates_across_restarts(spark, tmp_path):
    """transformWithStateInPandas (the Spark 4 successor API) must show
    the same cumulative-state-across-restart behavior as the
    applyInPandasWithState form, against the same batch twin."""
    from datacanary_spark.streaming.stateful import host_quota_stream_tws

    inp = str(tmp_path / "input")
    os.makedirs(inp)
    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")

    write_pages_parquet(inp, n_docs=80, seed=42, start_id=0)
    q = host_quota_stream_tws(spark, inp, ckpt, out)
    q.awaitTermination()
    assert _latest_from_sink(spark, out) == _batch_twin(spark, inp)

    write_pages_parquet(inp, n_docs=60, seed=42, start_id=5000)
    q2 = host_quota_stream_tws(spark, inp, ckpt, out)
    q2.awaitTermination()
    assert _latest_from_sink(spark, out) == _batch_twin(spark, inp)


def test_tws_processor_logic_with_fake_handle():
    """The StatefulProcessor's accumulation logic, unit-tested against
    a fake handle/ValueState (the sandbox cannot run the TWS worker
    protocol — protobuf is absent — so the logic is pinned here and
    the wiring mirrors the e2e-tested applyInPandasWithState path)."""
    import pandas as pd

    from datacanary_spark.streaming.stateful import HostQuotaProcessor

    class FakeValueState:
        def __init__(self):
            self._v = None

        def exists(self):
            return self._v is not None

        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    class FakeHandle:
        def __init__(self):
            self.states = {}

        def getValueState(self, name, schema, ttlDurationMs=None):
            self.requested_ttl = ttlDurationMs
            return self.states.setdefault(name, FakeValueState())

    handle = FakeHandle()
    proc = HostQuotaProcessor(state_ttl_ms=3_600_000)
    proc.init(handle)
    assert handle.requested_ttl == 3_600_000

    b1 = pd.DataFrame({"keep": [True, False, True]})
    out1 = list(proc.handleInputRows(("h.example",), iter([b1]), None))
    assert out1[0].iloc[0].tolist() == ["h.example", 3, 2]

    # second micro-batch accumulates on the stored state
    b2 = pd.DataFrame({"keep": [True]})
    out2 = list(proc.handleInputRows(("h.example",), iter([b2]), None))
    assert out2[0].iloc[0].tolist() == ["h.example", 4, 3]
    assert handle.states["counts"].get() == (4, 3)
    proc.close()


def test_tws_time_mode_matches_ttl():
    """A state TTL under timeMode="None" fails at query start on Spark 4
    (STATEFUL_PROCESSOR_INCORRECT_TIME_MODE_TO_ASSIGN_TTL) — pin that
    the operator picks ProcessingTime iff a TTL is requested."""
    from datacanary_spark.streaming.stateful import _tws_time_mode

    assert _tws_time_mode(None) == "None"
    assert _tws_time_mode(0) == "ProcessingTime"
    assert _tws_time_mode(3_600_000) == "ProcessingTime"
