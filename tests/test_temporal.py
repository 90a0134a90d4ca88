"""as-of join semantics (operators/temporal.py): backward match,
equal-timestamp inclusion, tolerance cutoff, null on no-match, suffix
on column collision. The sf-scale twin vs DuckDB's native ASOF JOIN is
the contract query `asof_click_to_view`."""

from __future__ import annotations

import datetime as dt

import pytest

from datacanary_spark.operators.temporal import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [(1, "u1", _ts("2024-01-01 10:00:00")),
         (2, "u1", _ts("2024-01-01 12:00:00")),
         (3, "u2", _ts("2024-01-01 09:00:00")),   # before any right row
         (4, "u3", _ts("2024-01-01 10:00:00"))],  # key absent on right
        "id: long, user_id: string, ts: timestamp")
    right = spark.createDataFrame(
        [(100, "u1", _ts("2024-01-01 09:30:00")),
         (101, "u1", _ts("2024-01-01 10:00:00")),  # equal ts -> matches id 1
         (102, "u1", _ts("2024-01-01 11:59:00")),
         (103, "u2", _ts("2024-01-01 09:30:00"))],
        "id: long, user_id: string, ts: timestamp")
    return left, right


def _by_id(rows):
    return {r["id"]: r for r in rows}


def test_asof_backward_semantics(frames):
    left, right = frames
    got = _by_id(asof_join(left, right, on="user_id").collect())
    assert got[1]["id_right"] == 101   # equal timestamp is eligible
    assert got[2]["id_right"] == 102   # latest preceding, not just any
    assert got[3]["id_right"] is None  # left row precedes all right rows
    assert got[4]["id_right"] is None  # key never on the right
    assert got[2]["ts_right"] == _ts("2024-01-01 11:59:00")


def test_asof_tolerance(frames):
    left, right = frames
    got = _by_id(asof_join(left, right, on="user_id",
                           tolerance_us=60_000_000).collect())
    assert got[1]["id_right"] == 101   # 0s gap within 60s
    assert got[2]["id_right"] == 102   # 60s gap, inclusive
    got2 = _by_id(asof_join(left, right, on="user_id",
                            tolerance_us=59_000_000).collect())
    assert got2[2]["id_right"] is None  # 60s gap exceeds 59s tolerance


def test_asof_column_naming(frames):
    left, right = frames
    out = asof_join(left, right, on="user_id", right_cols=["id"],
                    suffix="_v")
    assert set(out.columns) == {"id", "user_id", "ts", "id_v"}
