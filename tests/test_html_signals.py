"""HTML page-structure signals: title/robots/link-density expressions."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from datacanary_spark.operators.html_signals import page_signals

_PAGE = (
    "<html><head>\n"
    "<title>My <b>Page</b> </title>\n"
    '<meta name="robots" content="NOINDEX, follow">\n'
    "<style>p { color: red }</style>\n"
    "</head><body>\n"
    '<a href="/a"><span>one</span></a>'
    '<a href="/b">two22</a>\n'
    "<p>body text here</p>\n"
    "<script type='x'>var s = 'hidden';\nmore();</script>\n"
    "</body></html>"
)


def _signals(spark, html):
    df = spark.createDataFrame([("u", html)], "url string, html string")
    return page_signals(df).collect()[0]


def test_page_signals_full_page(spark):
    r = _signals(spark, _PAGE)
    # nested <b> stripped, trailing space trimmed
    assert r.title == "My Page"
    assert r.has_noindex is True          # case-insensitive directive
    assert r.n_links == 2
    assert r.anchor_chars == len("one") + len("two22")
    # script/style payloads excluded from visible text
    txt = r.text_chars
    assert r.script_chars == len("var s = 'hidden';\nmore();")
    visible = ("\nMy Page \n\n\n\nonetwo22\nbody text here\n\n")
    assert txt == len(visible)
    assert math.isclose(r.link_density, 8 / txt, rel_tol=1e-12)
    assert r.tag_count > 10


def test_robots_attribute_order_and_absence(spark):
    content_first = _signals(
        spark, '<meta content="noindex" name="robots"><p>x</p>')
    assert content_first.has_noindex is True
    other_meta = _signals(
        spark, '<meta name="viewport" content="noindex-ish"><p>x</p>')
    assert other_meta.has_noindex is False     # only the robots meta counts
    follow = _signals(spark, '<meta name="robots" content="index,follow">')
    assert follow.has_noindex is False


def test_no_title_and_no_links(spark):
    r = _signals(spark, "<p>just text</p>")
    assert r.title is None
    assert r.n_links == 0 and r.anchor_chars == 0
    assert r.link_density == 0.0
    assert r.text_chars == len("just text")


def test_all_markup_page_has_null_density(spark):
    # zero visible chars -> try_divide -> NULL, never an ANSI error
    r = _signals(spark, "<br><hr>")
    assert r.text_chars == 0 and r.link_density is None


def test_null_html_is_contained(spark):
    df = spark.createDataFrame([("u", None)], "url string, html string")
    r = page_signals(df).collect()[0]
    assert r.has_noindex is False and r.n_links == 0
    assert r.title is None and r.text_chars is None


def test_binary_html_and_passthrough_columns(spark):
    df = spark.createDataFrame(
        [("u", "en", bytearray(b"<title>T</title><a href='x'>go</a>"))],
        "url string, lang string, html binary")
    r = page_signals(df).collect()[0]
    assert (r.url, r.lang, r.title, r.n_links) == ("u", "en", "T", 1)


def test_signals_plan_is_expression_only(spark):
    df = spark.createDataFrame([("u", _PAGE)], "url string, html string")
    plan = (page_signals(df)
            ._jdf.queryExecution().executedPlan().toString())
    assert "EvalPython" not in plan
    assert "Exchange" not in plan          # per-row signals: no shuffle


def test_error_page_detection(spark):
    for title, want in [
        ("404 Not Found", True),
        ("404", True),
        ("  403 Forbidden", True),
        ("Oops — page not found", True),
        ("Access Denied", True),
        ("503 Service Unavailable", True),
        ("4040 parts in stock", False),     # \b guards the status code
        ("My holiday in 2024", False),
        ("Not Found Films — official site", False),  # bare phrase ≠ error
        ("Not Found", True),                # whole-title form still hits
        ("Forbidden", True),
        ("Visiting the Forbidden City — Travel Guide", False),
        ("Site Maintenance", True),
        ("The Art of Garden Maintenance", False),
    ]:
        r = _signals(spark, f"<title>{title}</title><p>body</p>")
        assert r.is_error_page is want, title
    # absent title -> False (summable), never NULL
    assert _signals(spark, "<p>untitled</p>").is_error_page is False
