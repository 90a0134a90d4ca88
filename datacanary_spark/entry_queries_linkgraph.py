"""Driver-contract queries: host link graph (operators/linkgraph.py).

Fixture-construction pattern (like ``warc_ingest_by_lang``): the INPUT
pages are synthesized from the documents table by a formula both sides
share — page ``i`` lives on host ``h{i % 17}.example`` and links to
doc ``j = (i*7 + 13*k + 1) % 400`` on host ``h{j % 17}.example`` for
``k = 1..(i % 4)``, plus a relative ``/about`` link and a fragment
link that extraction must DROP. The Spark side renders real HTML
bytes and runs the real extraction (``regexp_extract_all`` +
``parse_url``) and graph operators end-to-end; the oracle computes
the expected graph directly from the link formula, so an extraction
or ranking bug surfaces as a value mismatch.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datacanary_spark.entry_queries import _t, register
from datacanary_spark.operators.linkgraph import (
    extract_outlinks,
    host_edges,
    pagerank,
)

_N_PAGES = 400   # sf0.001 has 500 docs; every sf covers this slice
_N_HOSTS = 17
_DAMPING = 0.85
_PR_ITERS = 3

_LINKS_CTE = f"""
    links AS (
      SELECT 'h' || CAST(doc_id % {_N_HOSTS} AS VARCHAR) || '.example'
                 AS src_host,
             (doc_id * 7 + 13 * k + 1) % {_N_PAGES} AS j,
             'h' || CAST(((doc_id * 7 + 13 * k + 1) % {_N_PAGES})
                         % {_N_HOSTS} AS VARCHAR) || '.example'
                 AS dst_host
      FROM documents, range(1, 4) t(k)
      WHERE doc_id < {_N_PAGES} AND doc_id % 4 >= k
    )
"""

_EDGES_SQL = f"""
    WITH {_LINKS_CTE}
    SELECT src_host, dst_host, CAST(count(*) AS BIGINT) AS weight
    FROM links
    WHERE src_host <> dst_host
    GROUP BY src_host, dst_host
"""


def _pages(spark, sf_dir):
    """Render the synthetic pages table: (url string, html binary)."""
    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < _N_PAGES)
    i = F.col("doc_id")

    def link(k: int):
        j = (i * 7 + 13 * k + 1) % _N_PAGES
        # anchor text "<b>T{j%13}</b>  Go": nested markup, mixed case,
        # and doubled whitespace — extract_anchors must normalize it
        # to the two terms "t{j%13}" and "go".
        return F.when(
            i % 4 >= k,
            F.concat(F.lit('<a href="https://h'),
                     (j % _N_HOSTS).cast("string"),
                     F.lit(".example/doc/"), j.cast("string"),
                     F.lit('"><b>T'), (j % 13).cast("string"),
                     F.lit("</b>  Go</a>"))).otherwise(F.lit(""))

    html = F.concat(
        F.lit('<html><body><a href="/about">about</a>'
              '<a href="#top">top</a>'),
        link(1), link(2), link(3), F.lit("</body></html>"))
    url = F.concat(F.lit("https://h"), (i % _N_HOSTS).cast("string"),
                   F.lit(".example/page/"), i.cast("string"))
    return d.select(url.alias("url"), F.encode(html, "utf-8").alias("html"))


@register("outlink_host_edges", _EDGES_SQL)
def outlink_host_edges(spark, sf_dir):
    """Real HTML -> host-graph extraction end-to-end: render pages
    (binary HTML), harvest hrefs with regexp_extract_all, resolve
    hosts with parse_url (relative + fragment links must drop), and
    collapse to weighted cross-host edges. Expression-only — one
    narrow projection + one (src,dst)-keyed shuffle — the plan shape
    that turns a 10^12-page crawl into a ~10^8-row host graph.
    """
    return host_edges(extract_outlinks(_pages(spark, sf_dir)))


def _pagerank_sql() -> str:
    teleport = f"(1.0 - {_DAMPING}) / (SELECT n FROM nn)"
    prev = "r0"
    its = []
    for t in range(1, _PR_ITERS + 1):
        its.append(f"""
    it{t} AS (
      SELECT n.host,
             round({teleport} + {_DAMPING} *
                   coalesce(sum(r.rank / o.outdeg), 0), 12) AS rank
      FROM nodes n
      LEFT JOIN edges e ON e.dst_host = n.host
      LEFT JOIN {prev} r ON r.host = e.src_host
      LEFT JOIN outd o ON o.host = e.src_host
      GROUP BY n.host
    )""")
        prev = f"it{t}"
    return f"""
    WITH {_LINKS_CTE},
    edges AS (
      SELECT DISTINCT src_host, dst_host FROM links
      WHERE src_host <> dst_host
    ),
    nodes AS (
      SELECT DISTINCT host FROM (
        SELECT src_host AS host FROM edges
        UNION ALL SELECT dst_host FROM edges)
    ),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
    outd AS (
      SELECT src_host AS host, CAST(count(*) AS DOUBLE) AS outdeg
      FROM edges GROUP BY src_host
    ),
    r0 AS (
      SELECT host, round(1.0 / (SELECT n FROM nn), 12) AS rank FROM nodes
    ),{",".join(its)}
    SELECT host, round(rank, 6) AS rank FROM {prev}
"""


@register("host_pagerank", _pagerank_sql())
def host_pagerank(spark, sf_dir):
    """PageRank over the extracted host graph: 3 power iterations,
    damping 0.85, contributions split over distinct out-neighbors.
    The oracle replays the identical recurrence in SQL CTEs from the
    link formula; both sides bround each iteration to 12 dp so the
    different summation orders cannot drift, and the final rank to
    6 dp per the float contract. Every host in the 17-node fixture
    graph has outlinks, so the dangling term is exactly zero on both
    sides (the Spark operator still runs its dangling aggregate — the
    real code path, just with zero mass).
    """
    edges = host_edges(extract_outlinks(_pages(spark, sf_dir)))
    ranks = pagerank(edges, damping=_DAMPING, iterations=_PR_ITERS,
                     iter_round=12)
    return ranks.select("host", F.bround(F.col("rank"), 6).alias("rank"))


_ANCHOR_TERMS_SQL = f"""
    WITH {_LINKS_CTE},
    crossh AS (SELECT * FROM links WHERE src_host <> dst_host),
    terms AS (
      SELECT src_host, dst_host,
             't' || CAST(j % 13 AS VARCHAR) AS term FROM crossh
      UNION ALL
      SELECT src_host, dst_host, 'go' FROM crossh
    )
    SELECT dst_host, term,
           CAST(count(*) AS BIGINT) AS n_refs,
           CAST(count(DISTINCT src_host) AS BIGINT) AS n_src_hosts
    FROM terms GROUP BY dst_host, term
"""


@register("anchor_terms_by_host", _ANCHOR_TERMS_SQL)
def anchor_terms_by_host(spark, sf_dir):
    """Anchor-text harvest end-to-end: every page's ``<a>`` elements
    carry nested-markup, mixed-case, doubly-spaced anchor text
    (``<b>T{j%13}</b>  Go``); ``extract_anchors`` must strip the inner
    tags, collapse whitespace, and lowercase, and ``anchor_terms``
    tokenizes into (dst_host, term) reference counts with distinct
    referring-host breadth — the "what other sites call this host"
    signal. The oracle replays the link + anchor-text formula, so a
    markup-stripping, tokenization, or self-link-exclusion bug is a
    value mismatch. Expression-only; one (dst_host, term) shuffle.
    """
    from datacanary_spark.operators.linkgraph import (
        anchor_terms,
        extract_anchors,
    )

    return anchor_terms(extract_anchors(_pages(spark, sf_dir)))
