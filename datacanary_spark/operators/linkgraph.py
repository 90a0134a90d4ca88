"""Host-level link graph: outlink extraction, host edges, PageRank.

Web-scale curation pipelines use link structure as a quality prior
(host-level ranks computed from the crawl's own hyperlinks): extract
``href``s from raw HTML, collapse page->page links into a host->host
graph, then score hosts with a few PageRank power iterations. The
scores feed per-host filtering/weighting the same way
``operators/corpus_stats.py`` host reputation does.

Scale shape (10^12 pages, ~10^8 hosts):

- **extraction** is pure Column expressions (``regexp_extract_all`` +
  ``explode`` + ``parse_url``) — whole-stage codegen, no UDFs, and the
  url/html projection prunes the parquet scan to two columns.
- **host edges** is one shuffle keyed on the (src_host, dst_host)
  pair; the output graph is orders of magnitude smaller than the page
  table, so everything downstream runs on the reduced graph.
- **PageRank** is K rounds of (join + groupBy) over the host graph.
  Each round is ``localCheckpoint``-ed like
  ``graph.connected_components`` so the logical plan stays flat
  instead of doubling per iteration; per-round state is O(hosts).
  Dangling mass (hosts with no outlinks) is redistributed uniformly by
  default via one scalar aggregate per round — a driver-side pull of a
  single number, not data.

No counterpart exists in the reference (a single-table pandas tool,
`/root/reference/src/datacanary/__main__.py`); this belongs to the
LLM-pipeline extension surface alongside host reputation and the
domain blocklist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datacanary_spark.operators.html_signals import strip_tags_expr

__all__ = [
    "extract_outlinks",
    "extract_anchors",
    "anchor_terms",
    "host_edges",
    "host_degree_stats",
    "pagerank",
]

# href values — real HTML uses double quotes, single quotes, AND bare
# (unquoted) attribute values, so each style gets its own pattern (one
# regexp_extract_all per style; the arrays concat). The leading [^"#]
# / [^'#] / [^"'\s>#] keeps fragment-only links (#top) out while still
# catching "page.html#sec" prefixes via the capture running to the
# closing delimiter.
_HREF_DQ = r'(?i)href\s*=\s*"([^"#][^"]*)"'
_HREF_SQ = r"(?i)href\s*=\s*'([^'#][^']*)'"
_HREF_UQ = r"""(?i)href\s*=\s*([^"'\s>#][^\s>]*)"""
# full <a> elements (DOTALL: anchors span lines) in any href quote
# style; inner text is group 1, the href is re-extracted from the
# opening tag per element because regexp_extract_all returns ONE group.
_ANCHOR_ELEM = (r"(?is)<a\b[^>]*href\s*=\s*"
                r"""(?:"[^"#][^"]*"|'[^'#][^']*'|[^"'\s>#][^\s>]*)"""
                r"[^>]*>(.*?)</a\s*>")
_ANCHOR_OPEN_TAG = r"(?is)^<a\b[^>]*>"
# rel="... nofollow ..." in the OPENING tag only ([^>]* cannot cross the
# tag end, so a literal "rel=nofollow" in anchor text never matches);
# covers either attribute order, both quote styles, and multi-value
# rel lists ("nofollow ugc sponsored").
_NOFOLLOW = r'(?is)<a\b[^>]*\brel\s*=\s*["\'][^"\']*\bnofollow\b'


def extract_outlinks(pages: DataFrame, url_col: str = "url",
                     html_col: str = "html",
                     honor_nofollow: bool = False) -> DataFrame:
    """(src_host, dst_host) rows, one per absolute outlink.

    ``html_col`` may be string or binary (cast to string — crawl HTML
    is stored as bytes). Relative links (``/about``) and malformed
    URLs resolve to a NULL host via ``parse_url`` and are dropped —
    the same null-key exemption discipline as
    ``text_analysis.canonical_url_expr``. Hosts are lowercased.

    ``honor_nofollow=False`` (default) harvests every ``href`` in the
    page — ``<a>``, ``<link>``, ``<area>`` alike — the raw GRAPH
    structure. Set True for ENDORSEMENT semantics (PageRank input):
    extraction narrows to ``<a>`` elements and skips those whose
    ``rel`` disclaims endorsement (``nofollow``, incl. multi-value
    lists), per the convention the rel attribute exists for.
    """
    if honor_nofollow:
        a = extract_anchors(pages, url_col, html_col, honor_nofollow=True)
        return a.select("src_host", "dst_host")
    html = F.col(html_col).cast("string")
    hrefs = F.concat(
        F.regexp_extract_all(html, F.lit(_HREF_DQ), F.lit(1)),
        F.regexp_extract_all(html, F.lit(_HREF_SQ), F.lit(1)),
        F.regexp_extract_all(html, F.lit(_HREF_UQ), F.lit(1)))
    src = F.lower(F.try_parse_url(F.col(url_col), F.lit("HOST")))
    out = (pages
           .select(src.alias("src_host"), F.explode(hrefs).alias("_href"))
           .select("src_host",
                   F.lower(F.try_parse_url(F.col("_href"),
                                       F.lit("HOST"))).alias("dst_host")))
    return out.where(F.col("src_host").isNotNull()
                     & (F.col("src_host") != "")
                     & F.col("dst_host").isNotNull()
                     & (F.col("dst_host") != ""))


def extract_anchors(pages: DataFrame, url_col: str = "url",
                    html_col: str = "html",
                    honor_nofollow: bool = True) -> DataFrame:
    """(src_host, dst_host, anchor) rows — the link text the web uses
    to describe each target host (anchor text is a classic relevance /
    quality signal: it names a host in OTHER sites' words).

    Same null-host discipline as :func:`extract_outlinks`; anchor
    inner markup is stripped, whitespace collapsed, text lowercased.
    Expression-only: each ``<a>`` element is harvested once with
    ``regexp_extract_all`` (group 0) and href/text are re-extracted
    per element, so the page body is scanned a bounded number of
    times regardless of link count.

    ``honor_nofollow`` (default True — anchors measure ENDORSEMENT):
    skip anchors whose opening tag carries ``rel="nofollow"`` (either
    attribute order, either quote style, multi-value lists) — the
    publisher explicitly disclaimed the vote that anchor_terms /
    PageRank would otherwise count.
    """
    html = F.col(html_col).cast("string")
    elems = F.regexp_extract_all(html, F.lit(_ANCHOR_ELEM), F.lit(0))
    src = F.lower(F.try_parse_url(F.col(url_col), F.lit("HOST")))
    exploded = pages.select(src.alias("src_host"),
                            F.explode(elems).alias("_a"))
    if honor_nofollow:
        exploded = exploded.where(
            F.regexp_extract(F.col("_a"), _NOFOLLOW, 0) == "")
    # href comes from the OPENING tag only (never nested markup in the
    # anchor text), in whichever quote style the page used
    opening = F.regexp_extract(F.col("_a"), _ANCHOR_OPEN_TAG, 0)
    href = F.coalesce(
        *[F.nullif(F.regexp_extract(opening, p, 1), F.lit(""))
          for p in (_HREF_DQ, _HREF_SQ, _HREF_UQ)])
    e = (exploded
         .select(
             "src_host",
             F.lower(F.try_parse_url(href, F.lit("HOST"))).alias("dst_host"),
             F.lower(F.trim(F.regexp_replace(
                 strip_tags_expr(
                     F.regexp_extract(F.col("_a"), _ANCHOR_ELEM, 1)),
                 r"\s+", " "))).alias("anchor")))
    return e.where(F.col("src_host").isNotNull()
                   & (F.col("src_host") != "")
                   & F.col("dst_host").isNotNull()
                   & (F.col("dst_host") != ""))


def anchor_terms(anchors: DataFrame, cross_host_only: bool = True,
                 min_term_len: int = 2) -> DataFrame:
    """Collapse anchor rows to (dst_host, term, n_refs, n_src_hosts):
    how often each term describes a target host, and from how many
    DISTINCT referring hosts (endorsement breadth — spam farms repeat
    one source, organic reputation spans many).

    One shuffle keyed on (dst_host, term); the distinct-source count
    rides the same aggregate. ``cross_host_only`` drops self-referring
    anchors (site nav) before the shuffle.
    """
    a = anchors
    if cross_host_only:
        a = a.where(F.col("src_host") != F.col("dst_host"))
    # split on anything that is not a Unicode letter/digit — most of the
    # web's anchor text is not ASCII English, and [^0-9a-z] would shred
    # accented Latin and drop CJK/Cyrillic terms entirely
    terms = (a.select(
        "src_host", "dst_host",
        F.explode(F.split(F.col("anchor"), r"[^\p{L}\p{N}]+")).alias("term"))
        .where(F.length("term") >= min_term_len))
    return (terms.groupBy("dst_host", "term")
                 .agg(F.count(F.lit(1)).alias("n_refs"),
                      F.countDistinct("src_host").alias("n_src_hosts")))


def host_edges(outlinks: DataFrame, keep_self: bool = False) -> DataFrame:
    """Collapse page-level outlinks to weighted host->host edges.

    One shuffle on the host pair. ``keep_self`` retains same-host
    (intra-site) links, which dominate raw crawls; the default drops
    them because ranking cares about cross-host endorsement.
    """
    e = outlinks
    if not keep_self:
        e = e.where(F.col("src_host") != F.col("dst_host"))
    return (e.groupBy("src_host", "dst_host")
             .agg(F.count(F.lit(1)).alias("weight")))


def host_degree_stats(edges: DataFrame) -> DataFrame:
    """Per-host degree summary over weighted host edges: distinct
    out/in neighbor counts and total out/in link weight (full outer
    join so pure sources and pure sinks both appear)."""
    outd = (edges.groupBy(F.col("src_host").alias("host"))
                 .agg(F.count(F.lit(1)).alias("out_deg"),
                      F.sum("weight").alias("out_weight")))
    ind = (edges.groupBy(F.col("dst_host").alias("host"))
                .agg(F.count(F.lit(1)).alias("in_deg"),
                     F.sum("weight").alias("in_weight")))
    joined = outd.join(ind, "host", "full_outer")
    return joined.select(
        "host",
        *[F.coalesce(F.col(c), F.lit(0)).alias(c)
          for c in ("out_deg", "out_weight", "in_deg", "in_weight")])


def pagerank(edges: DataFrame, damping: float = 0.85, iterations: int = 3,
             dangling: str = "redistribute", iter_round: int | None = None,
             checkpoint: bool = True) -> DataFrame:
    """PageRank over host edges via K join+groupBy power iterations.

    rank_{t+1}(v) = (1-d)/N + d * (sum_{u->v} rank_t(u)/outdeg(u)
                                   + dangling_mass_t / N)

    Edges are deduplicated and self-loop-free (endorsement graph);
    contributions split evenly over distinct out-neighbors.
    ``dangling="redistribute"`` (default) spreads the rank mass of
    hosts with no outlinks uniformly — one scalar aggregate per round
    — keeping sum(rank) == 1; ``"lose"`` skips that job and lets the
    mass decay (cheaper, fine for relative ordering).

    ``iter_round`` brounds each iteration's ranks to that many
    decimals. The driver-contract query pins 12 so the DuckDB oracle
    twin (same formula, different summation order) stays bit-aligned
    through the iterations; library callers leave it None.

    Each round is ``localCheckpoint``-ed (see module docstring) so the
    plan for round t+1 is a flat scan of round t's O(hosts) result,
    not a t-deep join tree.
    """
    if dangling not in ("redistribute", "lose"):
        raise ValueError(f"unknown dangling mode: {dangling!r}")
    e = (edges.select("src_host", "dst_host")
              .where(F.col("src_host").isNotNull()
                     & F.col("dst_host").isNotNull()
                     & (F.col("src_host") != F.col("dst_host")))
              .distinct())
    nodes = (e.select(F.col("src_host").alias("host"))
              .unionByName(e.select(F.col("dst_host").alias("host")))
              .distinct())
    # Lazy checkpoints throughout (r06): plan truncation is identical
    # (the LogicalRDD is built at call time), but materialization rides
    # the next action that reads the frame — ``nodes.count()`` below,
    # each round's dangling-mass aggregate, or the caller's own action —
    # instead of one dedicated count() job per checkpoint. Measured on
    # the 17-host driver fixture this halves the job count.
    if checkpoint:
        e = e.localCheckpoint(eager=False)
        nodes = nodes.localCheckpoint(eager=False)
    n = nodes.count()
    if n == 0:
        return nodes.select("host", F.lit(0.0).alias("rank"))
    outd = (e.groupBy(F.col("src_host").alias("host"))
             .agg(F.count(F.lit(1)).cast("double").alias("outdeg")))
    # Hoist the loop-invariant work out of the rounds (r06): the
    # out-degree aggregate and the edges⋈outdeg join do not change
    # across iterations, yet the loop re-planned and re-executed both
    # per round (2 extra exchanges × iterations). Pre-joining outdeg
    # onto the edge list is the standard degree-normalized-edge-weight
    # layout; checkpointing both pins them to one computation.
    if checkpoint:
        # checkpoint outd FIRST and derive ew from the checkpointed
        # frame — built from the raw plan, ew's own checkpoint would
        # re-run the out-degree aggregate instead of reading outd's
        # materialized blocks (r06 review)
        outd = outd.localCheckpoint(eager=False)
    ew = e.join(outd.withColumnRenamed("host", "src_host"), "src_host")
    if checkpoint:
        ew = ew.localCheckpoint(eager=False)

    def _rnd(c):
        return F.bround(c, iter_round) if iter_round is not None else c

    ranks = nodes.select("host", _rnd(F.lit(1.0 / n)).alias("rank"))
    teleport = (1.0 - damping) / n
    for _ in range(iterations):
        if dangling == "redistribute":
            d_mass = (ranks.join(outd, "host", "left_anti")
                           .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
                           .first()[0])
        else:
            d_mass = 0.0
        contrib = (ew.join(ranks.withColumnRenamed("host", "src_host"),
                           "src_host")
                    .groupBy(F.col("dst_host").alias("host"))
                    .agg(F.sum(F.col("rank") / F.col("outdeg"))
                          .alias("_in")))
        ranks = (nodes.join(contrib, "host", "left")
                      .select("host",
                              _rnd(F.lit(teleport)
                                   + F.lit(damping)
                                   * (F.coalesce(F.col("_in"), F.lit(0.0))
                                      + F.lit(d_mass / n))).alias("rank")))
        if checkpoint:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks
