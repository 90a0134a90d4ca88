"""Host link graph: extraction, host edges, degree stats, PageRank."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from datacanary_spark.operators.linkgraph import (
    anchor_terms,
    extract_anchors,
    extract_outlinks,
    host_degree_stats,
    host_edges,
    pagerank,
)


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, html string")


def test_extract_outlinks_drops_relative_fragment_and_nulls(spark):
    pages = _pages(spark, [
        ("https://A.example/p1",
         '<a href="https://b.example/x">1</a>'
         '<a href="/about">rel</a>'
         '<a href="#top">frag</a>'
         '<a href="https://b.example/y">2</a>'
         '<a href="https://C.EXAMPLE/z#sec">3</a>'),
        ("https://a.example/p2", None),          # null html
        (None, '<a href="https://b.example/q">4</a>'),  # null url
    ])
    got = sorted(
        extract_outlinks(pages).collect(),
        key=lambda r: (r.src_host, r.dst_host))
    # hosts lowercased; relative/fragment links and null rows dropped
    assert [(r.src_host, r.dst_host) for r in got] == [
        ("a.example", "b.example"),
        ("a.example", "b.example"),
        ("a.example", "c.example"),
    ]


def test_extract_outlinks_accepts_binary_html(spark):
    pages = spark.createDataFrame(
        [("https://a.example/p", bytearray(
            b'<a href="https://b.example/x">1</a>'))],
        "url string, html binary")
    assert extract_outlinks(pages).collect()[0].dst_host == "b.example"


def test_host_edges_weights_and_self_loop_policy(spark):
    pages = _pages(spark, [
        ("https://a.example/1",
         '<a href="https://b.example/x">.</a>'
         '<a href="https://b.example/y">.</a>'
         '<a href="https://a.example/self">.</a>'),
    ])
    links = extract_outlinks(pages)
    e = {(r.src_host, r.dst_host): r.weight
         for r in host_edges(links).collect()}
    assert e == {("a.example", "b.example"): 2}
    e_self = {(r.src_host, r.dst_host): r.weight
              for r in host_edges(links, keep_self=True).collect()}
    assert e_self[("a.example", "a.example")] == 1


def test_host_degree_stats_full_outer(spark):
    edges = spark.createDataFrame(
        [("a", "b", 3), ("a", "c", 1), ("b", "c", 2)],
        "src_host string, dst_host string, weight long")
    got = {r.host: r for r in host_degree_stats(edges).collect()}
    assert (got["a"].out_deg, got["a"].out_weight,
            got["a"].in_deg, got["a"].in_weight) == (2, 4, 0, 0)
    # pure sink appears with zero out-degree
    assert (got["c"].out_deg, got["c"].in_deg, got["c"].in_weight) == (0, 2, 3)


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(u, v, 1) for u, v in pairs],
        "src_host string, dst_host string, weight long")


def test_pagerank_cycle_stays_uniform(spark):
    # a->b->c->a: uniform 1/3 is the fixed point at any damping
    ranks = {r.host: r.rank for r in pagerank(
        _edges(spark, [("a", "b"), ("b", "c"), ("c", "a")]),
        iterations=4).collect()}
    for v in ranks.values():
        assert math.isclose(v, 1 / 3, rel_tol=1e-12)


def test_pagerank_one_iteration_matches_hand_computation(spark):
    # star: a->c, b->c (c dangling, mass redistributed)
    # r0 = 1/3 each; dangling mass = 1/3
    # c: 0.05 + 0.85*(1/3 + 1/3 + (1/3)/3)
    # a,b: 0.05 + 0.85*((1/3)/3)
    ranks = {r.host: r.rank for r in pagerank(
        _edges(spark, [("a", "c"), ("b", "c")]), iterations=1).collect()}
    third = 1 / 3
    assert math.isclose(ranks["c"], 0.05 + 0.85 * (2 * third + third / 3),
                        rel_tol=1e-12)
    assert math.isclose(ranks["a"], 0.05 + 0.85 * (third / 3),
                        rel_tol=1e-12)
    assert ranks["a"] == ranks["b"]


def test_pagerank_mass_conserved_with_dangling(spark):
    e = _edges(spark, [("a", "b"), ("b", "c"), ("a", "c"), ("d", "a")])
    ranks = pagerank(e, iterations=5)
    total = ranks.agg(F.sum("rank")).first()[0]
    assert math.isclose(total, 1.0, rel_tol=1e-9)
    # "lose" mode leaks the dangling mass instead (strictly less)
    lost = pagerank(e, iterations=5, dangling="lose") \
        .agg(F.sum("rank")).first()[0]
    assert lost < total


def test_pagerank_dedups_edges_and_ignores_self_loops(spark):
    base = _edges(spark, [("a", "b"), ("b", "a")])
    noisy = _edges(spark, [("a", "b"), ("a", "b"), ("a", "a"), ("b", "a")])
    want = {r.host: r.rank for r in pagerank(base, iterations=3).collect()}
    got = {r.host: r.rank for r in pagerank(noisy, iterations=3).collect()}
    assert got == want


def test_pagerank_rejects_unknown_dangling_mode(spark):
    with pytest.raises(ValueError, match="dangling"):
        pagerank(_edges(spark, [("a", "b")]), dangling="wat")


def test_extraction_plan_is_expression_only(spark):
    """href harvest + host resolution stay JVM-side: no Python
    boundary anywhere, one Exchange (the host-pair aggregation)."""
    pages = _pages(spark, [("https://a.example/p",
                            '<a href="https://b.example/x">1</a>')])
    plan = host_edges(extract_outlinks(pages)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert plan.count("Exchange") == 1


def test_extract_anchors_normalizes_text(spark):
    pages = _pages(spark, [
        ("https://a.example/p",
         '<a href="https://B.example/x"><b>Big</b>\n  News</a>'
         '<a href="/rel">skip</a>'
         '<a href="https://c.example/y"></a>'),
    ])
    got = sorted(extract_anchors(pages).collect(),
                 key=lambda r: r.dst_host)
    assert [(r.src_host, r.dst_host, r.anchor) for r in got] == [
        ("a.example", "b.example", "big news"),   # tags stripped, ws collapsed
        ("a.example", "c.example", ""),           # empty anchor kept as row
    ]


def test_anchor_terms_counts_and_source_breadth(spark):
    rows = [("a", "z", "fast news"), ("b", "z", "news site"),
            ("a", "z", "news"), ("z", "z", "self nav"),
            ("a", "y", "x")]                      # 1-char term filtered
    anchors = spark.createDataFrame(
        rows, "src_host string, dst_host string, anchor string")
    got = {(r.dst_host, r.term): (r.n_refs, r.n_src_hosts)
           for r in anchor_terms(anchors).collect()}
    assert got[("z", "news")] == (3, 2)           # a twice, b once
    assert got[("z", "fast")] == (1, 1)
    assert ("z", "self") not in got               # cross-host only
    assert ("y", "x") not in got                  # min_term_len
    keep_self = {(r.dst_host, r.term) for r in anchor_terms(
        anchors, cross_host_only=False).collect()}
    assert ("z", "self") in keep_self


def test_extraction_handles_all_href_quote_styles(spark):
    # real HTML uses double quotes, single quotes, AND bare values;
    # fragment-only links drop in every style
    pages = _pages(spark, [
        ("https://a.example/p",
         '<a href="https://dq.example/x">dq</a>'
         "<a href='https://sq.example/y'>sq</a>"
         "<a href=https://uq.example/z>uq</a>"
         "<a href='#frag'>f1</a>"
         "<a href=#frag>f2</a>"
         "<a href = 'https://sp.example/w'>spaced</a>"),
    ])
    outs = sorted(r.dst_host for r in extract_outlinks(pages).collect())
    assert outs == ["dq.example", "sp.example", "sq.example", "uq.example"]
    anchors = {r.dst_host: r.anchor
               for r in extract_anchors(pages).collect()}
    assert anchors == {"dq.example": "dq", "sq.example": "sq",
                       "uq.example": "uq", "sp.example": "spaced"}


def test_anchor_terms_keep_non_ascii_text(spark):
    # most of the web's anchor text is not ASCII English: accented
    # Latin must stay whole and CJK must not vanish
    rows = [("a", "z", "propriété élégante"), ("b", "z", "中文链接"),
            ("c", "z", "café—bar")]
    anchors = spark.createDataFrame(
        rows, "src_host string, dst_host string, anchor string")
    got = {r.term for r in anchor_terms(anchors).collect()}
    assert got == {"propriété", "élégante", "中文链接", "café", "bar"}


def test_anchor_plan_is_expression_only(spark):
    pages = _pages(spark, [("https://a.example/p",
                            '<a href="https://b.example/x">hi there</a>')])
    plan = anchor_terms(extract_anchors(pages)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_malformed_hrefs_drop_instead_of_throwing(spark):
    # real crawls contain hrefs with spaces/illegal chars; ANSI
    # parse_url would THROW — try_parse_url must null them out
    pages = _pages(spark, [
        ("https://a.example/p",
         '<a href="not a url">x</a>'
         '<a href="https://b.example/ok">y</a>'),
        ("no scheme url", '<a href="https://c.example/z">z</a>'),
    ])
    got = [(r.src_host, r.dst_host)
           for r in extract_outlinks(pages).collect()]
    assert got == [("a.example", "b.example")]
    assert extract_anchors(pages).count() == 1


def test_nofollow_anchors_are_disclaimed_votes(spark):
    pages = _pages(spark, [
        ("https://a.example/p",
         '<a href="https://b.example/x" rel="nofollow">paid</a>'
         '<a rel="NOFOLLOW UGC" href="https://c.example/y">comment</a>'
         "<a href=\"https://d.example/z\" rel='nofollow'>sq</a>"
         '<a href="https://e.example/w" rel="noopener">fine</a>'
         '<a href="https://f.example/v">rel=nofollow in text</a>'),
    ])
    # default: endorsement semantics — all three disclaimer forms skip
    got = sorted(r.dst_host for r in extract_anchors(pages).collect())
    assert got == ["e.example", "f.example"]
    # raw-structure mode keeps every anchor
    raw = extract_anchors(pages, honor_nofollow=False)
    assert raw.count() == 5
    # outlinks: href harvest keeps all by default; endorsement mode
    # routes through the element extraction and drops the nofollows
    assert extract_outlinks(pages).count() == 5
    endorse = sorted(r.dst_host for r in
                     extract_outlinks(pages, honor_nofollow=True).collect())
    assert endorse == ["e.example", "f.example"]
