"""Session-window stateful streaming: sessions close by gap-split when a
later event arrives, or by EVENT-TIME TIMEOUT when the watermark passes
the open session's gap — across restarts of an AvailableNow query."""

from __future__ import annotations

import datetime as dt
import os

import pytest

from datacanary_spark.streaming.stateful import session_window_stream

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _write_drop(spark, input_dir, name, rows):
    # the file stream source expects flat files (a nested non-partition
    # directory is invisible to it) — write via a temp dir, then move
    # the part file into the input dir under a unique name
    import glob
    import shutil
    import tempfile

    df = spark.createDataFrame(
        [(i, ts, uid, "click", 1.0, "{}") for i, (ts, uid) in enumerate(rows)],
        "event_id: long, ts: timestamp, user_id: long, event_type: string, "
        "value: double, props: string")
    with tempfile.TemporaryDirectory() as tmp:
        out = os.path.join(tmp, "d")
        df.coalesce(1).write.parquet(out)
        part = glob.glob(os.path.join(out, "part-*.parquet"))[0]
        shutil.move(part, os.path.join(input_dir, f"{name}.parquet"))


@pytest.fixture(scope="module")
def dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("sessions")
    inp = str(root / "in")
    os.makedirs(inp)
    return {"in": inp, "ckpt": str(root / "ckpt"), "out": str(root / "out")}


def _emitted(spark, out_dir):
    if not os.path.isdir(out_dir):
        return set()
    return {(r["user_id"], r["session_start"], r["session_end"], r["n_events"])
            for r in spark.read.parquet(out_dir).collect()}


def test_sessions_close_by_gap_and_timeout(spark, dirs):
    m = dt.timedelta(minutes=1)
    # drop 1: u1 and u2 have 2-event sessions; u3 a single event
    _write_drop(spark, dirs["in"], "d1", [
        (T0, 1), (T0 + 10 * m, 1),
        (T0 + 2 * m, 2), (T0 + 12 * m, 2),
        (T0 + 5 * m, 3),
    ])
    session_window_stream(spark, dirs["in"], dirs["ckpt"], dirs["out"],
                          gap_s=1800).awaitTermination()
    assert _emitted(spark, dirs["out"]) == set()  # nothing closed yet

    # drop 2: u1 re-appears 2h later → gap-split closes u1's session 1,
    # and the watermark advance (T0+120m) fires the EVENT-TIME TIMEOUTS
    # of u2/u3's idle sessions within the same drain (Spark runs a
    # no-data batch after the watermark moves)
    _write_drop(spark, dirs["in"], "d2", [(T0 + 120 * m, 1)])
    session_window_stream(spark, dirs["in"], dirs["ckpt"], dirs["out"],
                          gap_s=1800).awaitTermination()
    got = _emitted(spark, dirs["out"])
    assert (1, T0, T0 + 10 * m, 2) in got          # closed by gap-split
    assert (2, T0 + 2 * m, T0 + 12 * m, 2) in got  # closed by timeout
    assert (3, T0 + 5 * m, T0 + 5 * m, 1) in got   # closed by timeout
    # u1's NEW session (T0+120m) is open: its timeout (T0+150m) is
    # beyond the current watermark
    assert not any(u == 1 and s == T0 + 120 * m for u, s, *_ in got)

    # drop 3: far-future event pushes the watermark past u1's open
    # session → emitted via timeout; the new event's own session stays
    # open (nothing later to advance the watermark past it)
    _write_drop(spark, dirs["in"], "d3", [(T0 + 600 * m, 99)])
    session_window_stream(spark, dirs["in"], dirs["ckpt"], dirs["out"],
                          gap_s=1800).awaitTermination()
    got = _emitted(spark, dirs["out"])
    assert (1, T0 + 120 * m, T0 + 120 * m, 1) in got
    assert not any(u == 99 for u, *_ in got)
    assert len(got) == 4  # exactly the four closed sessions, exactly once


def test_retrograde_events_merge_or_split_correctly(spark, tmp_path):
    """An admitted event that is event-time-OLDER than the open session's
    start (possible whenever the watermark delay is nonzero) must extend
    the session backward when within the gap, and become its own earlier
    session when beyond it — never be silently folded forward."""
    m = dt.timedelta(minutes=1)
    inp, ckpt, out = (str(tmp_path / d) for d in ("in", "ckpt", "out"))
    os.makedirs(inp)

    # drop 1: open sessions at T0+60m for users 5 and 6
    _write_drop(spark, inp, "d1", [(T0 + 60 * m, 5), (T0 + 60 * m, 6)])
    session_window_stream(spark, inp, ckpt, out, gap_s=1800,
                          watermark="4 hours").awaitTermination()

    # drop 2 (admitted — 4h watermark delay):
    #  u5: T0+50m, 10 min BEFORE its session start, within the 30-min gap
    #  u6: T0, 60 min before, beyond the gap -> separate earlier session
    _write_drop(spark, inp, "d2", [(T0 + 50 * m, 5), (T0, 6)])
    session_window_stream(spark, inp, ckpt, out, gap_s=1800,
                          watermark="4 hours").awaitTermination()
    got = _emitted(spark, out)
    assert (6, T0, T0, 1) in got               # closed earlier session
    assert not any(u == 5 for u, *_ in got)    # u5's merged session open

    # drop 3: far-future event closes everything via event-time timeout
    _write_drop(spark, inp, "d3", [(T0 + 600 * m, 99)])
    session_window_stream(spark, inp, ckpt, out, gap_s=1800,
                          watermark="4 hours").awaitTermination()
    got = _emitted(spark, out)
    assert (5, T0 + 50 * m, T0 + 60 * m, 2) in got  # extended BACKWARD
    assert (6, T0 + 60 * m, T0 + 60 * m, 1) in got
