"""robots.txt crawl-policy parsing and enforcement (RFC 9309).

A web-text pipeline must be able to honor per-host crawl policy: given
the robots.txt each host served at crawl time, drop every page whose
path the policy disallows for the harvesting agent. The reference
toolkit has no crawl-policy surface (it profiles tabular files); this
module exists for the web-corpus tier the north rule targets
(Common-Crawl-style pages at 10^12-doc scale, where re-filtering by a
stricter agent policy is a routine curation pass).

Scale shape
-----------
robots.txt is per-HOST data: one row per host, each file capped at
500 KiB by the RFC — the rules table is several orders of magnitude
smaller than the pages table (the web has ~10^8 hosts vs 10^12 pages).
So the plan is:

1. ``parse_robots``: one Arrow-batched pandas UDF pass over the rules
   table (tiny relative to pages) compiles each file to the rule group
   selected for the agent — ``array<struct<plen,pattern,allow>>``.
   Python string work happens on host-count rows, never page-count.
2. ``robots_filter``: rules are aggregated one-row-per-host (bounded:
   a 500 KiB file caps the rule count) and joined to pages on host —
   broadcast when the host table is small, hash-shuffle on the
   (never-skewed: unique) host key otherwise. The longest-match
   precedence is evaluated entirely in column expressions
   (``filter`` + ``regexp_like`` + ``array_max``) — per-page work is
   JVM-side, no Python in the page-volume path.

Semantics (RFC 9309, the parts that decide keep/drop)
-----------------------------------------------------
* Lines are ``key: value``; keys case-insensitive; ``#`` starts a
  comment; blank lines do NOT end a group (only a new user-agent line
  after rules does); BOM and CRLF tolerated.
* Consecutive ``User-agent`` lines form one group sharing its rules.
  If any group names the specific agent (case-insensitive product
  token), the union of those groups applies and ``*`` groups are
  ignored; otherwise the ``*`` groups apply; no group -> allow all.
* ``Allow``/``Disallow`` values are path patterns: ``*`` matches any
  octet sequence, a trailing ``$`` anchors the end. An EMPTY value is
  no rule at all (``Disallow:`` alone means allow everything).
* Precedence per page: the matching rule with the LONGEST pattern
  (octet length) wins; on a tie, ``Allow`` wins. No matching rule, no
  rules for the host, or no robots.txt at all -> allowed.
* Unknown directives (Sitemap, Crawl-delay, ...) are ignored entirely
  (they neither join nor split a group) — the behavior the reference
  Google parser documents for non-group lines.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

__all__ = [
    "parse_robots_text",
    "parse_robots",
    "robots_filter",
    "match_path_expr",
]

# RFC 9309 §2.4: parsers must process at least 500 KiB; we cap there
# so a hostile multi-GB robots.txt cannot blow up executor memory.
MAX_ROBOTS_BYTES = 500 * 1024

RULES_TYPE = T.ArrayType(T.StructType([
    T.StructField("plen", T.IntegerType()),      # octet length = precedence
    T.StructField("pattern", T.StringType()),    # anchored Java/RE2 regex
    T.StructField("allow", T.BooleanType()),
]))

_LINE_RE = re.compile(r"^([A-Za-z-]+)\s*:\s*(.*)$")


def _pattern_of(path: str) -> str:
    """Translate a robots path pattern to an anchored regex: ``*`` ->
    ``.*``, trailing ``$`` -> end anchor, everything else literal."""
    anchored = path.endswith("$")
    body = path[:-1] if anchored else path
    rx = "".join(".*" if ch == "*" else re.escape(ch) for ch in body)
    return "^" + rx + ("$" if anchored else "")


def parse_robots_text(text: str | None, agent: str = "*"):
    """Compile one robots.txt to the rule list RFC 9309 selects for
    ``agent``: ``[(plen, pattern, allow), ...]``. Pure Python so the
    unit tests and the pandas UDF share one implementation."""
    if text is None:
        return []
    if len(text.encode("utf-8", "ignore")) > MAX_ROBOTS_BYTES:
        text = text.encode("utf-8", "ignore")[:MAX_ROBOTS_BYTES].decode(
            "utf-8", "ignore")
    agent_lc = agent.lower()

    # groups: list of (agent_tokens, rules); rules = (plen, pattern, allow)
    groups: list[tuple[list[str], list[tuple[int, str, bool]]]] = []
    active: list[tuple[list[str], list[tuple[int, str, bool]]]] = []
    pending: list[str] = []       # agents of an open user-agent run

    for raw in text.splitlines():
        line = raw.lstrip("﻿")
        hash_ix = line.find("#")
        if hash_ix >= 0:
            line = line[:hash_ix]
        line = line.strip()
        if not line:
            continue
        m = _LINE_RE.match(line)
        if not m:
            continue
        key = m.group(1).lower()
        val = m.group(2).strip()
        if key == "user-agent":
            # consecutive user-agent lines accumulate into one run; a
            # run is closed by the first rule that follows it
            pending.append(val.lower())
        elif key in ("allow", "disallow"):
            if pending:
                grp = (pending, [])
                groups.append(grp)
                active = [grp]
                pending = []
            if not active:
                continue          # rule before any user-agent: ignore
            if not val:
                continue          # empty pattern is no rule (allow-all)
            rule = (len(val.encode("utf-8")), _pattern_of(val),
                    key == "allow")
            for g in active:
                g[1].append(rule)
        # any other directive (Sitemap, Crawl-delay, ...) is ignored

    if pending:
        # trailing user-agent run with no rules: a real (empty) group —
        # a specific agent named there gets allow-all, NOT the * rules
        groups.append((pending, []))

    specific = [g for g in groups
                if any(a == agent_lc for a in g[0])]
    chosen = specific if specific else [g for g in groups if "*" in g[0]]
    out: list[tuple[int, str, bool]] = []
    for g in chosen:
        out.extend(g[1])
    return out


def parse_robots(robots_df: DataFrame, agent: str = "*",
                 host_col: str = "host",
                 text_col: str = "robots_txt") -> DataFrame:
    """``(host, robots_txt)`` -> ``(host, _rules)`` with one compiled
    rule array per host. One Arrow pass over the host-count table."""

    @pandas_udf(RULES_TYPE)
    def compile_udf(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: parse_robots_text(t, agent))

    return (robots_df
            .select(F.col(host_col).alias("host"),
                    compile_udf(F.col(text_col)).alias("_rules"))
            .groupBy("host")
            .agg(F.flatten(F.collect_list("_rules")).alias("_rules")))


def match_path_expr(path: Column, rules: Column) -> Column:
    """True iff ``path`` is allowed under ``rules`` (compiled array).
    Pure column expressions: filter by regexp, argmax on
    (octet length, allow) so the longest match wins and Allow wins
    ties; empty/NULL rule set -> allowed."""
    matched = F.filter(rules, lambda r: F.regexp_like(path, r["pattern"]))
    best = F.array_max(F.transform(
        matched,
        lambda r: F.struct(r["plen"].alias("plen"),
                           r["allow"].cast("int").alias("a"))))
    return F.when(best.isNull(), F.lit(True)).otherwise(best["a"] == 1)


def robots_filter(pages: DataFrame, robots_df: DataFrame,
                  agent: str = "*", url_col: str = "url",
                  host_col: str = "host", text_col: str = "robots_txt",
                  broadcast_rules: bool = True,
                  keep_col: str | None = None) -> DataFrame:
    """Drop (or flag) pages whose URL path the host's robots.txt
    disallows for ``agent``.

    ``broadcast_rules=True`` broadcasts the compiled per-host rule
    table (right shape when hosts << executor memory, the common
    case); ``False`` falls back to a hash join on the unique host key.
    ``keep_col`` set -> annotate instead of filter (for lineage
    counting).

    Matching target is ``path[?query]`` (empty path -> ``/``), per the
    RFC's allowance for ``?`` inside patterns. Pages whose URL has no
    parseable host are NOT dropped — no policy can apply to them
    (consistent with the null-key exemptions elsewhere, e.g. the
    host-cap stage).
    """
    compiled = parse_robots(robots_df, agent=agent,
                            host_col=host_col, text_col=text_col)
    if broadcast_rules:
        compiled = F.broadcast(compiled)

    u = F.col(url_col)
    page_host = F.lower(F.try_parse_url(u, F.lit("HOST")))
    raw_path = F.try_parse_url(u, F.lit("PATH"))
    query = F.try_parse_url(u, F.lit("QUERY"))
    path = F.concat(
        F.when(raw_path.isNull() | (raw_path == ""), F.lit("/"))
         .otherwise(raw_path),
        F.when(query.isNotNull(), F.concat(F.lit("?"), query))
         .otherwise(F.lit("")))

    joined = (pages.withColumn("_rhost", page_host)
                   .withColumn("_rpath", path)
                   .join(compiled,
                         F.col("_rhost") == F.col("host"), "left"))
    allowed = (F.col("_rhost").isNull()
               | match_path_expr(F.col("_rpath"), F.col("_rules")))
    if keep_col is not None:
        out = joined.withColumn(keep_col, allowed)
    else:
        out = joined.where(allowed)
    return out.drop("host", "_rules", "_rhost", "_rpath")
