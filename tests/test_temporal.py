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


def test_range_join_boundaries(spark):
    """Pairs exactly at the window edge are included; one-past excluded;
    pairs straddling a bin boundary are still found (the ±1-bin probe)."""
    from datacanary_spark.operators.temporal import range_join

    left = spark.createDataFrame(
        [(1, "u", _ts("2024-01-01 10:00:00"))],
        "id: long, user_id: string, ts: timestamp")
    right = spark.createDataFrame(
        [(10, "u", _ts("2024-01-01 09:50:00")),   # exactly -window
         (11, "u", _ts("2024-01-01 10:10:00")),   # exactly +window
         (12, "u", _ts("2024-01-01 10:10:01")),   # one past
         (13, "u", _ts("2024-01-01 09:49:59")),   # one past (early)
         (14, "x", _ts("2024-01-01 10:00:00"))],  # other key
        "id: long, user_id: string, ts: timestamp")
    got = range_join(left, right, on="user_id", window_us=600_000_000,
                     right_cols=["id"], suffix="_r")
    assert sorted(r["id_r"] for r in got.collect()) == [10, 11]

    # straddle: left at a bin edge matches a right row in the PREVIOUS bin
    left2 = spark.createDataFrame(
        [(2, "u", _ts("2024-01-01 10:20:00"))],
        "id: long, user_id: string, ts: timestamp")
    got2 = range_join(left2, right, on="user_id", window_us=600_000_000,
                      right_cols=["id"], suffix="_r")
    assert sorted(r["id_r"] for r in got2.collect()) == [11, 12]


def test_range_join_no_cartesian(spark, queries=None):
    from datacanary_spark import entry_queries as eq

    df = eq.QUERIES["range_click_view_within_10m"](
        spark, "/root/testdata/sf0.01")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------------------------
# Property-based differential tests: Spark temporal joins vs a brute-force
# python reference on adversarial generated event sets (duplicate
# timestamps, singleton keys, all-left/all-right keys).
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_EPOCH = _ts("2024-01-01 00:00:00")

events_strategy = st.lists(
    st.tuples(st.sampled_from(["a", "b", "c"]),       # key
              st.integers(min_value=0, max_value=50),  # seconds offset
              st.booleans()),                          # side: left?
    min_size=1, max_size=30)


def _brute_asof(lefts, rights):
    out = {}
    for lid, (k, s) in lefts.items():
        best = None
        for rid, (rk, rs) in rights.items():
            if rk == k and rs <= s and (best is None or rs > rights[best][1]
                                        or (rs == rights[best][1] and rid > best)):
                best = rid
        out[lid] = best
    return out


@pytest.mark.filterwarnings("ignore")
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(evs=events_strategy)
def test_asof_join_matches_bruteforce(spark, evs):
    lefts, rights = {}, {}
    for i, (k, s, is_left) in enumerate(evs):
        (lefts if is_left else rights)[i] = (k, s)
    if not lefts or not rights:
        return
    mk = lambda d: spark.createDataFrame(
        [(i, k, _EPOCH + dt.timedelta(seconds=s)) for i, (k, s) in d.items()],
        "id: long, k: string, ts: timestamp")
    got = {r["id"]: r["id_right"]
           for r in asof_join(mk(lefts), mk(rights), on="k").collect()}
    exp = _brute_asof(lefts, rights)
    # ties on (key, ts): spark's last-in-sort-order wins; brute force
    # mirrors that with the rid > best tie-break — but the right-side
    # ORDER is (ts, kind) only, so equal-ts right rows are ordered by
    # their underlying sort which is not defined; compare the matched
    # TIMESTAMP instead of the id when ties exist.
    for lid, rid in exp.items():
        if rid is None:
            assert got[lid] is None, (lid, got[lid])
        else:
            assert got[lid] is not None, (lid, exp)
            assert rights[got[lid]][1] == rights[rid][1], (lid, got[lid], rid)
            assert rights[got[lid]][0] == rights[rid][0]


@pytest.mark.filterwarnings("ignore")
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(evs=events_strategy, window=st.integers(min_value=1, max_value=20))
def test_range_join_matches_bruteforce(spark, evs, window):
    from datacanary_spark.operators.temporal import range_join

    lefts, rights = {}, {}
    for i, (k, s, is_left) in enumerate(evs):
        (lefts if is_left else rights)[i] = (k, s)
    if not lefts or not rights:
        return
    mk = lambda d: spark.createDataFrame(
        [(i, k, _EPOCH + dt.timedelta(seconds=s)) for i, (k, s) in d.items()],
        "id: long, k: string, ts: timestamp")
    got = {(r["id"], r["id_r"]) for r in range_join(
        mk(lefts), mk(rights), on="k", window_us=window * 1_000_000,
        right_cols=["id"], suffix="_r").collect()}
    exp = {(lid, rid)
           for lid, (k, s) in lefts.items()
           for rid, (rk, rs) in rights.items()
           if rk == k and abs(rs - s) <= window}
    assert got == exp


def test_asof_tie_deterministic(spark):
    """Two right rows at the identical (key, ts): the match must be a
    pure function of the data — identical across partitionings/runs
    (payload-hash tie-break in the window order)."""
    left = spark.createDataFrame(
        [(1, "u", _ts("2024-01-01 10:00:00"))],
        "id: long, user_id: string, ts: timestamp")
    right = spark.createDataFrame(
        [(100, "u", _ts("2024-01-01 09:00:00")),
         (101, "u", _ts("2024-01-01 09:00:00"))],  # exact tie
        "id: long, user_id: string, ts: timestamp")
    picks = set()
    for parts in (1, 3, 7):
        got = asof_join(left.repartition(parts), right.repartition(parts),
                        on="user_id").collect()
        picks.add(got[0]["id_right"])
    assert len(picks) == 1
    assert picks.pop() in (100, 101)


def test_asof_map_typed_payload_column(spark):
    """hash() rejects MAP inputs, so the deterministic tie-break must
    skip unhashable payload columns instead of failing analysis — an
    as-of join against this pipeline's own verdict rows carries a
    rule_hits map<string,int>."""
    from pyspark.sql import functions as F

    left = spark.createDataFrame(
        [(1, "u", _ts("2024-01-01 10:00:00"))],
        "id: long, user_id: string, ts: timestamp")
    right = (spark.createDataFrame(
        [(100, "u", _ts("2024-01-01 09:00:00")),
         (101, "u", _ts("2024-01-01 09:30:00"))],
        "id: long, user_id: string, ts: timestamp")
        .withColumn("rule_hits", F.create_map(F.lit("min_len"),
                                              F.col("id") % 2)))
    got = asof_join(left, right, on="user_id").collect()
    assert got[0]["id_right"] == 101
    assert got[0]["rule_hits"] == {"min_len": 1}
