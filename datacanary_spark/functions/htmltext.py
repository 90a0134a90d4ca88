"""Real HTML → text extraction (trafilatura-class, pure Python).

``udfs.make_extract_udf`` is the byte-identity contract twin for the
fixture's ``<html><body>…</body></html>`` wrapper; THIS module is the
real-page extractor that slots into the same seam: drop non-content
subtrees (head, script/style/noscript/template, comments), convert
block-level tag boundaries to line breaks, strip remaining tags,
decode entities, and normalize whitespace per line. Deterministic
pure functions — same bytes in, same text out on any executor — which
is what lets the per-url byte-identity invariant hold across cluster
sizes and re-runs.

Spark shape: one scalar pandas UDF (Arrow-batched, binary → string);
the regex work happens on decoded Python strings inside the batch
loop. At 100 TB this is the one genuinely Python-bound stage of the
pipeline (like language-ID), so it shares the same budget: no per-row
UDF, no driver round-trips, scales with cores.
"""

from __future__ import annotations

import html as _entities
import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.pandas.functions import pandas_udf

# Subtrees whose text content is never page text. Non-greedy, matching
# open tag through its own close tag; (?is) = case-insensitive, dotall.
_DROP_SUBTREE = re.compile(
    r"(?is)<(head|script|style|noscript|template)\b[^>]*>.*?</\1\s*>")
_COMMENT = re.compile(r"(?s)<!--.*?-->")

# Tags that terminate a visual line. </p>, <br>, <li>, headings, table
# cells… Both open and close forms map to a newline; inline tags
# (<a>, <b>, <span>…) map to the empty string via _ANY_TAG.
_BLOCK_TAG = re.compile(
    r"(?i)</?(?:p|div|br|hr|h[1-6]|li|ul|ol|dl|dt|dd|table|thead|tbody|"
    r"tr|td|th|section|article|aside|header|footer|nav|main|form|"
    r"fieldset|blockquote|pre|figure|figcaption|address|body|html|title)"
    r"\b[^>]*>")
_ANY_TAG = re.compile(r"(?s)<[^>]+>")
_HSPACE = re.compile(r"[ \t\f\v\r]+")


def html_to_text(data: bytes | str | None) -> str | None:
    """Extract visible text from one HTML document.

    Output: one line per block-level element, horizontal whitespace
    collapsed to single spaces, lines stripped, empty lines dropped,
    entities decoded. NULL in → NULL out.
    """
    if data is None:
        return None
    s = (bytes(data).decode("utf-8", errors="replace")
         if not isinstance(data, str) else data)
    s = _COMMENT.sub("", s)
    s = _DROP_SUBTREE.sub("\n", s)
    s = _BLOCK_TAG.sub("\n", s)
    s = _ANY_TAG.sub("", s)
    s = _entities.unescape(s)
    lines = (_HSPACE.sub(" ", line).strip() for line in s.split("\n"))
    return "\n".join(line for line in lines if line)


def make_html_to_text_udf():
    """html(binary|string) → extracted text, Arrow-batched."""

    @pandas_udf(T.StringType())
    def extract(html: pd.Series) -> pd.Series:
        return html.map(html_to_text)

    return extract


def encode_html_entities(col):
    """Column expression: entity-encode text for embedding into HTML
    (&, <, > — the three that change parsing). Order matters: & first.
    The DuckDB oracle twin is the same three nested replace() calls.
    """
    c = F.regexp_replace(col, "&", "&amp;")
    c = F.regexp_replace(c, "<", "&lt;")
    return F.regexp_replace(c, ">", "&gt;")
