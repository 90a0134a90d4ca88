"""operators/dedup.latest_snapshot_dedup: recrawl snapshot dedup."""

from __future__ import annotations

from pyspark.sql import Row

from datacanary_spark.operators.dedup import latest_snapshot_dedup


def _pages(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, url=u, warc_ts=ts, text=t)
         for i, (u, ts, t) in enumerate(rows)],
        schema="doc_id long, url string, warc_ts long, text string")


def test_latest_ts_wins_and_min_id_breaks_ties(spark):
    df = _pages(spark, [
        ("https://a.com/x", 100, "old"),
        ("https://a.com/x", 300, "newest"),   # doc 1: latest -> survives
        ("https://a.com/x", 200, "mid"),
        ("https://b.com/y", 50, "tie-lo-id"),  # doc 3: tie -> min id wins
        ("https://b.com/y", 50, "tie-hi-id"),
    ])
    out = {r.url: r for r in latest_snapshot_dedup(
        df, count_col="n_snapshots").collect()}
    assert len(out) == 2
    a, b = out["https://a.com/x"], out["https://b.com/y"]
    assert (a.doc_id, a.text, a.n_snapshots) == (1, "newest", 3)
    assert (b.doc_id, b.text, b.n_snapshots) == (3, "tie-lo-id", 2)


def test_null_url_rows_are_exempt(spark):
    df = _pages(spark, [
        (None, 100, "unparseable-1"),
        (None, 900, "unparseable-2"),   # NOT deduped against each other
        ("https://a.com", 10, "real"),
    ])
    out = latest_snapshot_dedup(df, count_col="n_snapshots").collect()
    assert len(out) == 3
    nulls = [r for r in out if r.url is None]
    assert sorted(r.doc_id for r in nulls) == [0, 1]
    assert all(r.n_snapshots == 1 for r in nulls)


def test_null_ts_loses_to_dated_and_all_null_falls_back_to_min_id(spark):
    df = _pages(spark, [
        ("https://a.com", None, "undated"),
        ("https://a.com", 5, "dated"),        # dated beats undated
        ("https://b.com", None, "undated-0"),  # all undated -> min doc_id
        ("https://b.com", None, "undated-1"),
    ])
    out = {r.url: r for r in latest_snapshot_dedup(df).collect()}
    assert out["https://a.com"].text == "dated"
    assert out["https://b.com"].doc_id == 2


def test_schema_and_columns_preserved(spark):
    df = _pages(spark, [("https://a.com", 1, "t")])
    out = latest_snapshot_dedup(df)
    assert out.columns == df.columns
    out2 = latest_snapshot_dedup(df, count_col="n_snapshots")
    assert out2.columns == df.columns + ["n_snapshots"]
    assert dict(out2.dtypes)["n_snapshots"] == "bigint"
