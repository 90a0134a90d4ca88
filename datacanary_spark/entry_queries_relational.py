"""Driver-contract queries: relational operator coverage (joins, windows,
set ops, time bucketing, sessionization) over the TPC-H-style tables.

The reference has no relational operators at all (single-table tool —
SURVEY.md §2.6); the north-rule pipeline needs them (golden-label
joins, resume anti-joins, lineage rollups), so each category gets an
oracle-checked query here.

Float discipline: money aggregates run in DECIMAL on both sides —
decimal addition is exact and associative, so Spark's parallel partial
aggregation and DuckDB's sequential scan produce identical digits
(double sums would differ in the last ulps by reduction order).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from datacanary_spark.entry_queries import _t, register

# Width chosen so a decimal product stays ≤ 38 digits in BOTH engines:
# (18,4) × (19,4) → width 37, scale 8. DuckDB silently converts any
# wider product to DOUBLE (breaking exactness); Spark would instead
# reduce scale. 18,4 is ample for TPC-H money/quantity/discount.
# COMPUTE in decimal, but the RESULT wire type is STRING: the driver's
# Arrow/pandas hasher decays DuckDB DECIMAL(30,6) to float64 while Spark
# keeps object(Decimal), so value-identical decimals hash-mismatch
# (round-1 verdict). CAST(dec AS VARCHAR) pads to scale identically in
# both engines ("6.000000"), giving a shared exact wire value.
DEC = "decimal(18,4)"
DEC_OUT = "decimal(30,6)"


def _dec(col):
    return col.cast(DEC)


# ---------------------------------------------------------------------------
# Aggregation over a filtered scan (TPC-H Q1 shape)
# ---------------------------------------------------------------------------

@register(
    "tpch_q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(30,6))
                AS VARCHAR) AS sum_qty,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(30,6))
                AS VARCHAR) AS sum_base_price,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                    * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))))
                AS DECIMAL(30,6)) AS VARCHAR) AS sum_disc_price,
           round(avg(l_quantity), 6) AS avg_qty,
           round(avg(l_discount), 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1_pricing_summary(spark, sf_dir):
    """Pricing summary: predicate pushed to the parquet scan, one
    partial+final hash aggregate; money sums in exact decimal.

    Deliberately NOT spread (r06 review): the decimal sums are
    order-exact, but avg_qty/avg_disc run on raw DOUBLE columns — on
    the unspread single-split scan their summation order equals the
    serial oracle's BY CONSTRUCTION in any environment, while a spread
    would make the last bit depend on the session's core count and
    lean on bround(6) to hide it. ~0.5 s at bench scale is not worth
    trading structural exactness for rounding luck."""
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(_dec(F.col("l_quantity"))).cast(DEC_OUT).cast("string").alias("sum_qty"),
        F.sum(_dec(F.col("l_extendedprice"))).cast(DEC_OUT).cast("string")
        .alias("sum_base_price"),
        F.sum(_dec(F.col("l_extendedprice"))
              * (F.lit(1).cast(DEC) - _dec(F.col("l_discount")))).cast(DEC_OUT)
        .cast("string").alias("sum_disc_price"),
        F.bround(F.avg("l_quantity"), 6).alias("avg_qty"),
        F.bround(F.avg("l_discount"), 6).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


# ---------------------------------------------------------------------------
# Multi-join star + broadcast dims (TPC-H Q5 shape)
# ---------------------------------------------------------------------------

@register(
    "revenue_by_nation",
    """
    SELECT n_name,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                    * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))))
                AS DECIMAL(30,6)) AS VARCHAR) AS revenue,
           count(*) AS n_items
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
)
def revenue_by_nation(spark, sf_dir):
    """Fact-to-fact join shuffles on the keys; nation/region are
    broadcast (hinted explicitly — they're KB-sized at any scale)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")))
    li = _t(spark, sf_dir, "lineitem")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    r = F.broadcast(_t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA"))
    rev = _dec(F.col("l_extendedprice")) * (F.lit(1).cast(DEC) - _dec(F.col("l_discount")))
    return (c.join(o, c.c_custkey == o.o_custkey)
             .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
             .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
             .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
             .groupBy("n_name")
             .agg(F.sum(rev).cast(DEC_OUT).cast("string").alias("revenue"),
                  F.count(F.lit(1)).alias("n_items")))


# ---------------------------------------------------------------------------
# Window functions (top-k per group)
# ---------------------------------------------------------------------------

@register(
    "top3_orders_per_customer",
    """
    WITH ranked AS (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(row_number() OVER (PARTITION BY o_custkey
                                     ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
      FROM orders
    )
    SELECT c_custkey, c_mktsegment, o_orderkey, o_totalprice, rn
    FROM ranked JOIN customer ON o_custkey = c_custkey
    WHERE rn <= 3 AND c_custkey < 200
    """,
)
def top3_orders_per_customer(spark, sf_dir):
    """Deterministic top-k per group: one shuffle on the partition key,
    rank applied before the (broadcastable) dimension join."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").where(F.col("c_custkey") < 200)
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey"))
    ranked = (o.withColumn("rn", F.row_number().over(w).cast("int"))
               .where(F.col("rn") <= 3))
    return ranked.join(F.broadcast(c), ranked.o_custkey == c.c_custkey).select(
        "c_custkey", "c_mktsegment", "o_orderkey", "o_totalprice", "rn")


# ---------------------------------------------------------------------------
# Semi / anti joins (resume-delta shape: exclude already-processed keys)
# ---------------------------------------------------------------------------

@register(
    "orders_semi_high_qty",
    """
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders SEMI JOIN (SELECT l_orderkey FROM lineitem WHERE l_quantity > 45) t
      ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority
    """,
)
def orders_semi_high_qty(spark, sf_dir):
    """Left-semi: orders having at least one qty>45 line."""
    o = _t(spark, sf_dir, "orders")
    hi = _t(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 45) \
        .select("l_orderkey")
    return (o.join(hi, o.o_orderkey == hi.l_orderkey, "left_semi")
             .groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_orders")))


@register(
    "orders_anti_high_qty",
    """
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders ANTI JOIN (SELECT l_orderkey FROM lineitem WHERE l_quantity > 45) t
      ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority
    """,
)
def orders_anti_high_qty(spark, sf_dir):
    """Left-anti: the complement — this is exactly the resume-delta
    pattern (drop inputs whose keys already appear in the output)."""
    o = _t(spark, sf_dir, "orders")
    hi = _t(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 45) \
        .select("l_orderkey")
    return (o.join(hi, o.o_orderkey == hi.l_orderkey, "left_anti")
             .groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_orders")))


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------

@register(
    "setop_long_docs_except_sources",
    """
    SELECT doc_id FROM documents WHERE n_chars > 300
    EXCEPT
    SELECT doc_id FROM documents WHERE source IN ('src0','src1','src2')
    """,
)
def setop_long_docs_except_sources(spark, sf_dir):
    """EXCEPT (distinct set difference): long docs outside three sources
    — the resume-delta shape expressed as a set op."""
    d = _t(spark, sf_dir, "documents")
    long_docs = d.where(F.col("n_chars") > 300).select("doc_id")
    src_docs = d.where(F.col("source").isin("src0", "src1", "src2")).select("doc_id")
    return long_docs.subtract(src_docs)  # EXCEPT DISTINCT


@register(
    "setop_long_docs_intersect_sources",
    """
    SELECT doc_id FROM documents WHERE n_chars > 300
    INTERSECT
    SELECT doc_id FROM documents WHERE source IN ('src0','src1','src2')
    """,
)
def setop_long_docs_intersect_sources(spark, sf_dir):
    """INTERSECT (distinct): long docs inside the three sources."""
    d = _t(spark, sf_dir, "documents")
    long_docs = d.where(F.col("n_chars") > 300).select("doc_id")
    src_docs = d.where(F.col("source").isin("src0", "src1", "src2")).select("doc_id")
    return long_docs.intersect(src_docs)


# ---------------------------------------------------------------------------
# Time bucketing + sessionization over the events stream table
# ---------------------------------------------------------------------------

@register(
    "events_hourly",
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
           event_type,
           count(*) AS n_events,
           round(avg(value), 6) AS avg_value
    FROM events
    WHERE ts < TIMESTAMP '2024-01-03'
    GROUP BY 1, 2
    """,
)
def events_hourly(spark, sf_dir):
    """Tumbling-window aggregate (the batch twin of a streaming
    window(ts, '1 hour') — see streaming/)."""
    e = _t(spark, sf_dir, "events").where(
        F.col("ts") < F.lit("2024-01-03").cast("timestamp"))
    return (e.groupBy(
                F.date_format(F.date_trunc("hour", F.col("ts")),
                              "yyyy-MM-dd HH:mm:ss").alias("hour"),
                "event_type")
             .agg(F.count(F.lit(1)).alias("n_events"),
                  F.bround(F.avg("value"), 6).alias("avg_value")))


@register(
    "revenue_by_nation_brand",
    """
    SELECT n_name, p_brand,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                    * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))))
                AS DECIMAL(30,6)) AS VARCHAR) AS revenue,
           count(*) AS n_items
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_size <= 10
    GROUP BY n_name, p_brand
    """,
)
def revenue_by_nation_brand(spark, sf_dir):
    """TPC-H Q9-shaped star over the two remaining dimension tables
    (part, supplier): fact shuffles on its join keys, the filtered part
    dim and the KB-sized supplier/nation dims broadcast. Money in exact
    decimal, emitted as the shared string wire type."""
    li = _t(spark, sf_dir, "lineitem")
    p = F.broadcast(_t(spark, sf_dir, "part").where(F.col("p_size") <= 10))
    s = F.broadcast(_t(spark, sf_dir, "supplier"))
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    rev = _dec(F.col("l_extendedprice")) * (F.lit(1).cast(DEC) - _dec(F.col("l_discount")))
    return (li.join(p, F.col("l_partkey") == F.col("p_partkey"))
              .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
              .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
              .groupBy("n_name", "p_brand")
              .agg(F.sum(rev).cast(DEC_OUT).cast("string").alias("revenue"),
                   F.count(F.lit(1)).alias("n_items")))


@register(
    "asof_click_to_view",
    """
    SELECT c.event_id AS click_id,
           c.user_id,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
           v.event_id AS view_id,
           strftime(v.ts, '%Y-%m-%d %H:%M:%S') AS view_ts
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON c.user_id = v.user_id AND c.ts >= v.ts
    """,
)
def asof_click_to_view(spark, sf_dir):
    """As-of join (attribution): each click matched to the user's most
    recent view at or before it — the point-in-time lookup Spark lacks
    as a primitive, via the union-window technique (operators/
    temporal.py: one shuffle on user_id, O(|L|+|R|), never a per-key
    cartesian). Oracle is DuckDB's native ASOF LEFT JOIN."""
    from datacanary_spark.operators.temporal import asof_join

    e = _t(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click")
    views = e.where(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("view_id"))
    j = asof_join(clicks, views, on="user_id",
                  right_cols=["view_id", "ts"], suffix="_v")
    return j.select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        "view_id",
        F.date_format("ts_v", "yyyy-MM-dd HH:mm:ss").alias("view_ts"))


@register(
    "range_click_view_within_10m",
    """
    SELECT c.event_id AS click_id, v.event_id AS view_id,
           epoch_us(c.ts) - epoch_us(v.ts) AS gap_us
    FROM events c JOIN events v
      ON c.user_id = v.user_id
     AND c.event_type = 'click' AND v.event_type = 'view'
     AND abs(epoch_us(c.ts) - epoch_us(v.ts)) <= 600000000
    """,
)
def range_click_view_within_10m(spark, sf_dir):
    """Band/range join: every (click, view) pair per user within ±10
    minutes — bucketed into window-sized time bins so the plan is an
    equi-join on (user_id, bin) probing the ±1-bin neighborhood
    (operators/temporal.py::range_join), never a per-key cartesian.
    Gap compared/emitted in exact integer microseconds."""
    from datacanary_spark.operators.temporal import range_join

    e = _t(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id"))
    views = e.where(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("view_id"))
    j = range_join(clicks, views, on="user_id", window_us=600_000_000,
                   right_cols=["view_id", "ts"], suffix="_v")
    return j.select(
        "click_id", "view_id",
        (F.unix_micros(F.col("ts").cast("timestamp"))
         - F.unix_micros(F.col("ts_v").cast("timestamp"))).alias("gap_us"))


@register(
    "host_counts_salted",
    """
    SELECT source || '.example.com' AS host,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN n_chars > 300 THEN 1 ELSE 0 END) AS BIGINT) AS kept,
           CAST(sum(CASE WHEN n_chars > 300 THEN 0 ELSE 1 END) AS BIGINT) AS dropped
    FROM documents GROUP BY source
    """,
)
def host_counts_salted(spark, sf_dir):
    """Per-host keep/drop rollup through the SALTED two-stage aggregation
    (plans/lineage.py::host_metrics_salted) — the north rule's explicit
    skew pattern: a Zipf-head host's rows spread over 16 salted partial
    keys before the merge, so no single reducer sees a hot host's full
    stream. The salt is plan-internal; results are exactly the plain
    GROUP BY (which is what the oracle computes)."""
    from datacanary_spark.plans.lineage import host_metrics_salted

    d = _t(spark, sf_dir, "documents").select(
        F.concat(F.lit("https://"), F.col("source"),
                 F.lit(".example.com/doc/"),
                 F.col("doc_id").cast("string")).alias("url"),
        (F.col("n_chars") > 300).alias("keep"))
    return host_metrics_salted(d)


@register(
    "lineage_rollup_lang_source",
    """
    SELECT lang, source,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY ROLLUP (lang, source)
    """,
)
def lineage_rollup_lang_source(spark, sf_dir):
    """Grouping sets (ROLLUP) over the lineage dimensions: per
    (lang, source), per lang, and grand-total rows from ONE aggregation
    — the multi-granularity metrics rollup a 100 TB job emits in a
    single shuffle instead of three. (SURVEY §2.6 marked grouping sets
    'not needed' for reference parity; the lineage table wants them.)"""
    d = _t(spark, sf_dir, "documents")
    return d.rollup("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"))


@register(
    "user_sessions",
    """
    WITH o AS (
      SELECT user_id, ts, event_id,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    ),
    flagged AS (
      SELECT user_id,
             CASE WHEN prev_ts IS NULL
                       OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM o
    )
    SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions,
           count(*) AS n_events
    FROM flagged GROUP BY user_id
    """,
)
def user_sessions(spark, sf_dir):
    """Gap-based sessionization (30-min idle timeout) via lag(): the
    batch twin of stateful streaming session windows. Gap compared in
    exact integer microseconds on both engines."""
    e = _t(spark, sf_dir, "events").withColumn(
        "ts_us", F.unix_micros(F.col("ts").cast("timestamp")))  # NTZ→UTC instant
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = e.select(
        "user_id",
        F.when(F.lag("ts_us").over(w).isNull()
               | ((F.col("ts_us") - F.lag("ts_us").over(w)) > 1800000000),
               1).otherwise(0).alias("new_session"))
    return flagged.groupBy("user_id").agg(
        F.sum("new_session").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"))


# ---------------------------------------------------------------------------
# Window frames (moving average / running total) + ntile bucketing
# ---------------------------------------------------------------------------

@register(
    "events_rolling_hourly",
    """
    WITH hourly AS (
      SELECT event_type,
             strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
             count(*) AS n_events
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, hour, n_events,
           round(avg(n_events) OVER (
             PARTITION BY event_type ORDER BY hour
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS mov_avg_3h,
           CAST(sum(n_events) OVER (
             PARTITION BY event_type ORDER BY hour
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_events
    FROM hourly
    """,
)
def events_rolling_hourly(spark, sf_dir):
    """Window FRAMES over the hourly event stream: a 3-hour ROWS-frame
    moving average (the crawl-health trend line) and a running total —
    the frame varieties (bounded preceding / unbounded preceding) the
    other window queries don't touch. Frames run over the AGGREGATED
    hourly rows, so per-partition window state is O(hours), never
    O(events)."""
    e = _t(spark, sf_dir, "events")
    hourly = (e.groupBy(
                  "event_type",
                  F.date_format(F.date_trunc("hour", F.col("ts")),
                                "yyyy-MM-dd HH:mm:ss").alias("hour"))
               .agg(F.count(F.lit(1)).alias("n_events")))
    w = Window.partitionBy("event_type").orderBy("hour")
    return hourly.select(
        "event_type", "hour", "n_events",
        F.bround(F.avg("n_events").over(w.rowsBetween(-2, 0)), 6)
         .alias("mov_avg_3h"),
        F.sum("n_events").over(
            w.rowsBetween(Window.unboundedPreceding, 0))
         .alias("cum_events"))


@register(
    "doc_length_deciles_by_lang",
    """
    WITH ranked AS (
      SELECT lang, n_chars,
             ntile(10) OVER (PARTITION BY lang
                             ORDER BY n_chars NULLS LAST, doc_id) AS decile
      FROM documents
    )
    SELECT lang, CAST(decile AS INT) AS decile, count(*) AS n_docs,
           min(n_chars) AS min_chars, max(n_chars) AS max_chars
    FROM ranked GROUP BY 1, 2
    """,
)
def doc_length_deciles_by_lang(spark, sf_dir):
    """ntile() bucketing of document length per language — the
    corpus-mixing view ("how long is each decile of each language").
    The window ORDER BY includes doc_id so tile assignment is fully
    deterministic (identical on any engine or partitioning), and null
    ordering is EXPLICIT (nulls last) — Spark's ASC default is nulls
    FIRST while DuckDB's is nulls LAST, a divergence that would shift
    every tile boundary on a corpus with null n_chars. The min/max per
    tile then pin the exact bucket boundaries."""
    d = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.col("n_chars").asc_nulls_last(), "doc_id")
    ranked = d.select("lang", "n_chars",
                      F.ntile(10).over(w).alias("decile"))
    return ranked.groupBy("lang", "decile").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"))
