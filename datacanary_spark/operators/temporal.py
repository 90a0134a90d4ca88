"""Temporal joins Spark lacks as scalable primitives: as-of join
(+ tolerance) and band/range join (both bucketed — no per-key
cartesian).

An as-of join matches each left row to the single most recent right row
(per key) at or before its timestamp — the attribution / point-in-time
lookup pattern (click → latest preceding view, trade → latest quote).
Spark has no ASOF JOIN; the naive `l.join(r, l.ts >= r.ts)` +
`row_number` explodes to a per-key cartesian before ranking.

This implementation is the scale-correct union-window technique:

    union(left tagged k=1, right tagged k=0)
      → ONE shuffle on the join key
      → in-partition sort by (event time, tag)
      → running `last(right_payload, ignorenulls=True)`

Cost is O(|L|+|R|) shuffle rows + a per-key sort — never a pair blowup.
At equal timestamps the right row sorts first (k=0 < k=1), so an
exactly-simultaneous right row matches, which is DuckDB ASOF's
``l.ts >= r.ts`` semantics — the oracle twin.

Skew: a hot key's rows land in one partition for the sort. Per-user /
per-host event streams are naturally bounded; for a pathological key,
pre-bucket by (key, coarse time bucket) and run a boundary-stitch pass
— the operator's plan shape doesn't change.

Reference lineage: the reference has no joins at all (single-table
tool, SURVEY.md §2.6); this covers the rebuild-need column of the
joins row (as-of/range).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _hashable(dt: T.DataType) -> bool:
    """True iff ``hash()`` accepts the type: Spark rejects MAP anywhere
    in the input (no canonical entry order), recursively inside
    arrays/structs too."""
    if isinstance(dt, T.MapType):
        return False
    if isinstance(dt, T.ArrayType):
        return _hashable(dt.elementType)
    if isinstance(dt, T.StructType):
        return all(_hashable(f.dataType) for f in dt.fields)
    return True


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    window_us: int,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Band/interval join: all (left, right) pairs per key with
    ``|left.ts - right.ts| <= window_us``.

    The naive formulation (`on key AND abs(lt - rt) <= w`) plans as a
    per-key cartesian filtered late. Here both sides are bucketed into
    window-sized time bins and the left side probes its own and both
    adjacent bins — the join becomes an EQUI-join on (key, bin) whose
    candidate set is only the ±1-bin neighborhood, then the exact
    predicate filters. One shuffle per side; AQE splits hot
    (key, bin) buckets.
    """
    on = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in on]

    lt = F.unix_micros(F.col(left_ts).cast("timestamp"))
    rt = F.unix_micros(F.col(right_ts).cast("timestamp"))
    w = F.lit(window_us)

    l2 = (left.withColumn("_t", lt)
          .withColumn("_bin", F.explode(F.array(
              F.floor(F.col("_t") / w) - 1,
              F.floor(F.col("_t") / w),
              F.floor(F.col("_t") / w) + 1)))
          )
    r2 = right.select(*on, rt.alias("_rt"),
                      F.floor(rt / w).alias("_bin"),
                      *[F.col(c).alias(f"_rc_{i}")
                        for i, c in enumerate(right_cols)])

    # no pair-dedup needed: a right row lives in exactly ONE bin and a
    # left row probes each bin at most once, so every qualifying pair
    # meets exactly once
    j = (l2.join(r2, on + ["_bin"])
           .where(F.abs(F.col("_t") - F.col("_rt")) <= w))

    left_names = set(left.columns)
    sel = [F.col(c) for c in left.columns]
    sel += [F.col(f"_rc_{i}").alias(c + suffix if c in left_names else c)
            for i, c in enumerate(right_cols)]
    return j.select(*sel)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    tolerance_us: int | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of-backward join: every left row, plus the columns of the
    latest right row (per ``on`` key) with ``right.ts <= left.ts``
    (nulls when none exists, or when the match is older than
    ``tolerance_us`` microseconds).

    Right columns are emitted as ``<name><suffix>`` when the name
    collides with a left column, verbatim otherwise.
    """
    on = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in on]

    # exact integer event times (TIMESTAMP_NTZ must go through
    # cast("timestamp") before unix_micros — Spark 4 rejects NTZ)
    lt = F.unix_micros(F.col(left_ts).cast("timestamp"))
    rt = F.unix_micros(F.col(right_ts).cast("timestamp"))

    payload = F.struct(rt.alias("_rt"),
                       *[F.col(c) for c in right_cols]).alias("_r")
    r_struct_type = right.select(payload).schema["_r"].dataType
    left_row = F.struct(*[F.col(c) for c in left.columns]).alias("_l")
    l_struct_type = left.select(left_row).schema["_l"].dataType

    l2 = left.select(*on, lt.alias("_t"), F.lit(1).alias("_k"),
                     left_row, F.lit(None).cast(r_struct_type).alias("_r"))
    r2 = right.select(*on, rt.alias("_t"), F.lit(0).alias("_k"),
                      F.lit(None).cast(l_struct_type).alias("_l"), payload)

    # Deterministic tie-break: when two RIGHT rows share (key, ts), order
    # them by a stable hash of their payload so the match is a pure
    # function of the data, not of partitioning/sort luck. (_k keeps
    # right rows ahead of left rows at equal ts regardless.) hash() is
    # prohibited on MAP-typed inputs (DATATYPE_MISMATCH.HASH_MAP_TYPE),
    # so the tie-break hashes only the hashable payload fields — e.g.
    # an as-of join against this pipeline's own verdict rows carries a
    # rule_hits map<string,int> that must be excluded, not fatal.
    hashable = ["_r._rt"] + [f"_r.{c}" for c in right_cols
                             if _hashable(right.schema[c].dataType)]
    w = (Window.partitionBy(*on).orderBy("_t", "_k",
                                         F.hash(*hashable).asc_nulls_last())
         .rowsBetween(Window.unboundedPreceding, 0))
    u = l2.unionByName(r2).withColumn(
        "_match", F.last("_r", ignorenulls=True).over(w))
    if tolerance_us is not None:
        u = u.withColumn(
            "_match",
            F.when(F.col("_t") - F.col("_match._rt") <= F.lit(tolerance_us),
                   F.col("_match")))

    out = u.where(F.col("_k") == 1)
    left_names = set(left.columns)
    sel = [F.col(f"_l.{c}").alias(c) for c in left.columns]
    sel += [F.col(f"_match.{c}").alias(c + suffix if c in left_names else c)
            for c in right_cols]
    return out.select(*sel)
