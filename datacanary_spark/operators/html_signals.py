"""Per-page HTML structure signals: title, robots directives, link
density, markup/script mass — jusText/Boilerpipe-style page-quality
features computed as pure Column expressions over raw crawl HTML.

Web-curation pipelines use page *structure* (not just extracted text)
as keep/drop evidence: a page that is mostly anchors is a nav/link
farm, a ``<meta name="robots" content="noindex">`` page asked not to
be indexed, and a page that is mostly ``<script>`` payload carries no
prose. The reference has no HTML handling at all (it profiles flat
parquet columns, `/root/reference/src/datacanary/analysers/
statistical_analyser.py`); this module belongs to the web-text
extension surface next to ``functions/htmltext.py`` (which extracts
the prose) and ``operators/linkgraph.py`` (which harvests the links).

Scale shape (10^12 pages): everything here is ``regexp_extract_all`` /
``regexp_replace`` / ``transform`` / ``aggregate`` Column expressions
— whole-stage codegen, zero Python boundaries, and the url/html
projection prunes the parquet scan to the two columns used. Signals
are per-row (no shuffle); the only Exchange in a signal rollup is the
final group-by, identical to any other per-doc heuristic.

Caveats (documented, deliberate): regex-level HTML parsing — no
entity decoding (``&amp;`` counts as 5 visible chars, same policy as
``functions/htmltext.html_to_text``'s entity step handles separately),
and pathological markup (unclosed ``<a>``, comments containing tags)
degrades gracefully to under/over-counting rather than erroring.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "strip_tags_expr",
    "title_expr",
    "robots_content_expr",
    "has_noindex_expr",
    "canonical_link_expr",
    "error_page_expr",
    "visible_text_expr",
    "anchor_texts_expr",
    "link_density_expr",
    "script_char_count_expr",
    "tag_count_expr",
    "page_signals",
]

# (?is): case-insensitive + DOTALL — crawl HTML spans lines freely.
_SCRIPT_STYLE = r"(?is)<(script|style)\b[^>]*>.*?</\1\s*>"
_TAG = r"(?s)<[^>]*>"
_TITLE = r"(?is)<title[^>]*>(.*?)</title\s*>"
_ANCHOR = r"(?is)<a\b[^>]*>(.*?)</a\s*>"
_SCRIPT = r"(?is)<script\b[^>]*>(.*?)</script\s*>"
# robots meta: attribute order varies in the wild, so try name-first
# and content-first forms and take whichever matched.
_ROBOTS_NAME_FIRST = (r'(?is)<meta\s[^>]*name\s*=\s*["\']robots["\']'
                      r'[^>]*content\s*=\s*["\']([^"\']*)["\']')
_ROBOTS_CONTENT_FIRST = (r'(?is)<meta\s[^>]*content\s*=\s*["\']([^"\']*)'
                         r'["\'][^>]*name\s*=\s*["\']robots["\']')
# <link rel="canonical">: same attribute-order split as the robots meta.
_CANON_REL_FIRST = (r'(?is)<link\s[^>]*rel\s*=\s*["\']canonical["\']'
                    r'[^>]*href\s*=\s*["\']([^"\']+)["\']')
_CANON_HREF_FIRST = (r'(?is)<link\s[^>]*href\s*=\s*["\']([^"\']+)["\']'
                     r'[^>]*rel\s*=\s*["\']canonical["\']')


def _s(html_col: Column) -> Column:
    """Crawl HTML is stored as bytes; signals work on the string view."""
    return html_col.cast("string")


def strip_tags_expr(col: Column) -> Column:
    """Remove every ``<...>`` span — the ONE tag-stripping policy shared
    by the signal expressions here and ``operators/linkgraph``'s anchor
    normalization (``functions/htmltext`` keeps its own variant because
    its byte-exact extraction contract also decodes entities)."""
    return F.regexp_replace(col, _TAG, "")


# module-internal alias (public name added when linkgraph began sharing it)
_strip_tags = strip_tags_expr


def title_expr(html_col: Column) -> Column:
    """``<title>`` inner text with nested tags stripped and whitespace
    trimmed; NULL when absent or empty."""
    raw = F.regexp_extract(_s(html_col), _TITLE, 1)
    return F.nullif(F.trim(_strip_tags(raw)), F.lit(""))


def robots_content_expr(html_col: Column) -> Column:
    """content attribute of the robots ``<meta>`` tag (either attribute
    order); NULL when the page declares none."""
    h = _s(html_col)
    return F.coalesce(
        F.nullif(F.regexp_extract(h, _ROBOTS_NAME_FIRST, 1), F.lit("")),
        F.nullif(F.regexp_extract(h, _ROBOTS_CONTENT_FIRST, 1), F.lit("")))


def has_noindex_expr(html_col: Column) -> Column:
    """True iff a robots meta directive contains ``noindex`` — pages
    that asked to stay out of indexes get dropped by polite pipelines.
    False (not NULL) when no robots meta exists, so the column can be
    summed directly."""
    return F.coalesce(
        F.lower(robots_content_expr(html_col)).contains("noindex"),
        F.lit(False))


# soft-404 titles: servers that return 200 for missing pages usually
# say so in the <title>. Conservative list — status-code prefixes,
# QUALIFIED phrases ("page not found", not bare "not found", which
# matches real titles like "The Lost and Not Found"), and whole-title
# forms for the single words; curation pipelines tune per-corpus.
_ERROR_TITLE = (r"(?i)(^\s*(40[134]|410|50[023])\b"
                r"|\b(page|file|document|article|url)\s+not\s+found\b"
                r"|^\s*not\s+found\s*$"
                r"|\bpage\s+(temporarily\s+)?unavailable\b"
                r"|\baccess\s+(denied|forbidden)\b"
                r"|^\s*forbidden\s*$"
                r"|\b(site|down\s+for|under)\s+maintenance\b)")


def error_page_expr(html_col: Column) -> Column:
    """True iff the page's title reads like an error / soft-404 page —
    crawls are full of 200-status "Page Not Found" responses that
    carry no content worth training on. False (not NULL) when the
    title is absent, so the column sums directly; pages with no title
    at all are the text rules' problem, not this signal's."""
    return F.coalesce(title_expr(html_col).rlike(_ERROR_TITLE),
                      F.lit(False))


def canonical_link_expr(html_col: Column) -> Column:
    """href of the page's ``<link rel="canonical">`` declaration (either
    attribute order), or NULL when the page declares none.

    Only ABSOLUTE http(s) targets are honored; relative canonical hrefs
    would need base-URL resolution (page URL + ``<base>`` tag), which a
    per-column expression can't see — they return NULL (unknown), the
    same exempt-from-grouping convention as ``canonical_url_expr``'s
    malformed-URL rule. Dedup semantics live in
    ``operators/dedup.canonical_dedup``.
    """
    h = _s(html_col)
    raw = F.coalesce(
        F.nullif(F.regexp_extract(h, _CANON_REL_FIRST, 1), F.lit("")),
        F.nullif(F.regexp_extract(h, _CANON_HREF_FIRST, 1), F.lit("")))
    return F.when(raw.rlike(r"(?i)^https?://"), raw)


def visible_text_expr(html_col: Column) -> Column:
    """Markup-free character stream: script/style blocks removed first
    (their payload is code, not prose), then all tags. No entity
    decoding — this is a *signal* denominator, not extraction (use
    ``functions/htmltext.html_to_text`` for byte-exact text)."""
    return _strip_tags(F.regexp_replace(_s(html_col), _SCRIPT_STYLE, ""))


def anchor_texts_expr(html_col: Column) -> Column:
    """Array of anchor inner texts (nested tags inside each ``<a>``
    stripped), in document order."""
    inner = F.regexp_extract_all(_s(html_col), F.lit(_ANCHOR), F.lit(1))
    return F.transform(inner, _strip_tags)


def _char_sum(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0).cast("long"),
                       lambda acc, x: acc + F.length(x))


def link_density_expr(html_col: Column) -> Column:
    """anchor-text chars / visible-text chars — the jusText link-farm
    signal. NULL when the page has no visible text (try_divide: ANSI
    mode would throw on /0)."""
    return F.try_divide(
        _char_sum(anchor_texts_expr(html_col)).cast("double"),
        F.length(visible_text_expr(html_col)).cast("double"))


def script_char_count_expr(html_col: Column) -> Column:
    """Total chars inside ``<script>`` bodies — inline-payload mass."""
    return _char_sum(
        F.regexp_extract_all(_s(html_col), F.lit(_SCRIPT), F.lit(1)))


def tag_count_expr(html_col: Column) -> Column:
    """Number of opening/closing tags (markup density numerator)."""
    return F.regexp_count(_s(html_col), F.lit(r"(?s)</?[a-zA-Z]"))


def page_signals(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """Append the per-page signal columns to ``pages`` (all input
    columns pass through, so callers keep url/lang/... without a join):
    ``title``, ``has_noindex``, ``is_error_page``, ``n_links``,
    ``anchor_chars``, ``text_chars``, ``script_chars``, ``tag_count``,
    ``link_density``. NULL html yields NULL signals except
    ``has_noindex``/``is_error_page`` (False) and ``n_links`` (0) so
    rollups stay sum-able."""
    h = F.col(html_col)
    anchors = anchor_texts_expr(h)
    return pages.select(
        "*",
        title_expr(h).alias("title"),
        has_noindex_expr(h).alias("has_noindex"),
        error_page_expr(h).alias("is_error_page"),
        F.coalesce(F.size(anchors), F.lit(0)).alias("n_links"),
        _char_sum(anchors).alias("anchor_chars"),
        F.length(visible_text_expr(h)).cast("long").alias("text_chars"),
        script_char_count_expr(h).alias("script_chars"),
        tag_count_expr(h).cast("long").alias("tag_count"),
        link_density_expr(h).alias("link_density"),
    )
