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


# ---------------------------------------------------------------------------
# operators/dedup.canonical_dedup: <link rel="canonical"> group collapse
# ---------------------------------------------------------------------------

from pyspark.sql import functions as F  # noqa: E402

from datacanary_spark.operators.dedup import canonical_dedup  # noqa: E402
from datacanary_spark.operators.html_signals import (  # noqa: E402
    canonical_link_expr,
)


def _canon_pages(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, url=u, html=h) for i, (u, h) in enumerate(rows)],
        schema="doc_id long, url string, html string")


def _canon_html(target):
    return f'<html><head><link rel="canonical" href="{target}"></head></html>'


def test_variants_collapse_to_declared_canonical(spark):
    c = "https://a.com/page"
    df = _canon_pages(spark, [
        (c, _canon_html(c)),                        # 0: the canonical itself
        ("https://a.com/page?utm=1", _canon_html(c)),   # 1: variant
        ("https://m.a.com/page", _canon_html(c)),       # 2: mobile mirror
        ("https://b.com/other", "<html></html>"),       # 3: no declaration
    ])
    out = {r.url: r for r in canonical_dedup(df, count_col="n_variants")
           .collect()}
    assert set(out) == {c, "https://b.com/other"}
    assert (out[c].doc_id, out[c].n_variants) == (0, 3)
    assert out["https://b.com/other"].n_variants == 1


def test_absent_canonical_falls_back_to_min_id(spark):
    # every page points at a target that is NOT itself in the corpus:
    # the minimum id among the pointers survives
    df = _canon_pages(spark, [
        ("https://x.com/v2", _canon_html("https://x.com/v1")),
        ("https://x.com/v3", _canon_html("https://x.com/v1")),
    ])
    out = canonical_dedup(df, count_col="n_variants").collect()
    assert len(out) == 1
    assert (out[0].doc_id, out[0].n_variants) == (0, 2)


def test_attribute_order_relative_and_null_handling(spark):
    href_first = ('<link href="https://c.com/canon" rel="canonical">')
    df = _canon_pages(spark, [
        ("https://c.com/canon", f"<head>{href_first}</head>"),
        ("https://c.com/alt", f"<head>{href_first}</head>"),
        # relative canonical: unresolvable per-column -> own-url identity
        ("https://d.com/p", '<link rel="canonical" href="/p">'),
        # no url AND no declaration: exempt, passes through
        (None, "<html>no identity evidence</html>"),
        (None, None),
    ])
    out = canonical_dedup(df).collect()
    urls = sorted((r.url or "~none") for r in out)
    assert urls == ["https://c.com/canon", "https://d.com/p",
                    "~none", "~none"]


def test_canonical_link_expr_values(spark):
    df = spark.createDataFrame(
        [("a", _canon_html("https://A.com/x")),
         ("b", '<link rel="stylesheet" href="https://cdn.com/a.css">'),
         ("c", '<LINK REL="CANONICAL" HREF="HTTP://UP.COM/Y">'),
         ("d", None)],
        "k string, html string")
    got = dict(df.select("k", canonical_link_expr(F.col("html"))
                         .alias("c")).collect())
    assert got["a"] == "https://A.com/x"     # value case preserved
    assert got["b"] is None                  # other <link> rels ignored
    assert got["c"] == "HTTP://UP.COM/Y"     # tag/attr case-insensitive
    assert got["d"] is None


def test_canonical_dedup_plan_one_exchange_no_python(spark):
    df = _canon_pages(spark, [("https://a.com", _canon_html("https://a.com"))])
    plan = canonical_dedup(df) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    # one grouping shuffle for the picked side (exempt side is narrow)
    assert plan.count("Exchange") <= 2
