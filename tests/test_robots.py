"""robots.txt crawl-policy tests: RFC 9309 parser semantics (pure
Python twin) and the distributed rules-join filter."""

from __future__ import annotations

from pyspark.sql import functions as F

from datacanary_spark.operators.robots import (
    MAX_ROBOTS_BYTES,
    parse_robots,
    parse_robots_text,
    robots_filter,
)


def allowed(text, path, agent="*"):
    import re
    rules = parse_robots_text(text, agent)
    matched = [(plen, allow) for plen, pat, allow in rules
               if re.search(pat, path)]
    if not matched:
        return True
    return max(matched)[1]


# ---------------------------------------------------------------------------
# parser semantics
# ---------------------------------------------------------------------------

def test_empty_and_missing_allow_everything():
    assert parse_robots_text(None) == []
    assert parse_robots_text("") == []
    assert allowed("", "/anything")


def test_basic_disallow_and_longest_match_allow_override():
    txt = "User-agent: *\nDisallow: /private/\nAllow: /private/public"
    assert not allowed(txt, "/private/x")
    assert allowed(txt, "/private/public-page")   # longer allow wins
    assert allowed(txt, "/other")


def test_tie_prefers_allow():
    txt = "User-agent: *\nDisallow: /p/\nAllow: /p/"
    assert allowed(txt, "/p/x")


def test_wildcard_and_end_anchor():
    txt = "User-agent: *\nDisallow: /*.pdf$\nDisallow: /tmp*"
    assert not allowed(txt, "/docs/a.pdf")
    assert allowed(txt, "/docs/a.pdf?x=1")        # $ anchors the end
    assert not allowed(txt, "/tmp/file")
    assert not allowed(txt, "/tmpfile")
    assert allowed(txt, "/a/tmp")                 # pattern anchors at start


def test_regex_metachars_in_paths_are_literal():
    txt = "User-agent: *\nDisallow: /a+b(c)/"
    assert not allowed(txt, "/a+b(c)/x")
    assert allowed(txt, "/aab(c)/x")              # '+' is not regex plus


def test_consecutive_user_agents_share_one_group():
    txt = "User-agent: a\nUser-agent: b\nDisallow: /x"
    assert not allowed(txt, "/x/1", agent="a")
    assert not allowed(txt, "/x/1", agent="b")
    assert allowed(txt, "/x/1", agent="c")        # no * group -> allow


def test_specific_agent_group_overrides_star():
    txt = ("User-agent: *\nDisallow: /all/\n\n"
           "User-agent: canarybot\nDisallow: /bot-only/\n")
    # canarybot gets ONLY its group: /all/ no longer applies
    assert allowed(txt, "/all/x", agent="canarybot")
    assert not allowed(txt, "/bot-only/x", agent="canarybot")
    assert not allowed(txt, "/all/x", agent="other")
    assert allowed(txt, "/bot-only/x", agent="other")


def test_multiple_groups_for_same_agent_union():
    txt = ("User-agent: a\nDisallow: /one\n\n"
           "User-agent: a\nDisallow: /two\n")
    assert not allowed(txt, "/one", agent="a")
    assert not allowed(txt, "/two", agent="a")


def test_trailing_agent_run_without_rules_is_empty_group():
    txt = "User-agent: *\nDisallow: /x\n\nUser-agent: canarybot\n"
    # the empty canarybot group means allow-all for it, not * fallback
    assert allowed(txt, "/x/1", agent="canarybot")
    assert not allowed(txt, "/x/1", agent="other")


def test_comments_blank_lines_case_crlf_and_unknown_directives():
    txt = ("# top comment\r\n"
           "USER-AGENT: *\r\n"
           "Sitemap: https://h.example/sitemap.xml\r\n"
           "DISALLOW: /a/  # trailing comment\r\n"
           "Crawl-delay: 10\r\n"
           "disallow: /b/\r\n")
    # Sitemap/Crawl-delay between rules neither split nor end the group
    assert not allowed(txt, "/a/x")
    assert not allowed(txt, "/b/x")
    assert allowed(txt, "/c/x")


def test_empty_disallow_value_is_no_rule():
    txt = "User-agent: *\nDisallow:\n"
    assert allowed(txt, "/anything")
    assert parse_robots_text(txt) == []


def test_rule_before_any_group_is_ignored():
    assert parse_robots_text("Disallow: /x\n") == []


def test_oversized_file_truncated_at_cap():
    filler = "# pad\n" * (MAX_ROBOTS_BYTES // 6)
    txt = filler + "User-agent: *\nDisallow: /late\n"
    # the group lies beyond the 500 KiB cap -> not parsed
    assert parse_robots_text(txt) == []
    txt2 = "User-agent: *\nDisallow: /early\n" + filler
    assert not allowed(txt2, "/early/x")


def test_agent_match_is_case_insensitive():
    txt = "User-agent: CanaryBot\nDisallow: /x\n"
    assert not allowed(txt, "/x", agent="canarybot")


# ---------------------------------------------------------------------------
# distributed filter
# ---------------------------------------------------------------------------

_ROBOTS_A = ("User-agent: *\n"
             "Disallow: /private/\n"
             "Allow: /private/ok\n"
             "Disallow: /*.zip$\n")
_ROBOTS_B = ("User-agent: canarybot\nDisallow: /\n"
             "\nUser-agent: *\nDisallow: /b-star/\n")


def _pages(spark):
    rows = [
        (1, "https://a.example/private/x"),        # drop (A)
        (2, "https://a.example/private/ok-page"),  # keep: longer allow
        (3, "https://a.example/pub/f.zip"),        # drop: wildcard$
        (4, "https://a.example/pub/f.zip?x=1"),    # keep: $ anchor
        (5, "https://A.EXAMPLE/private/y"),        # drop: host case-folded
        (6, "https://b.example/b-star/x"),         # drop for *, keep for bot
        (7, "https://b.example/other"),            # keep for *, drop for bot
        (8, "https://nohost.example/anything"),    # keep: no robots row
        (9, "not a url at all"),                   # keep: null host exempt
        (10, "https://a.example"),                 # keep: empty path -> /
    ]
    return spark.createDataFrame(rows, "doc_id bigint, url string")


def _robots(spark):
    return spark.createDataFrame(
        [("a.example", _ROBOTS_A), ("b.example", _ROBOTS_B)],
        "host string, robots_txt string")


def test_robots_filter_star_agent(spark):
    out = robots_filter(_pages(spark), _robots(spark), agent="*")
    kept = sorted(r.doc_id for r in out.collect())
    assert kept == [2, 4, 7, 8, 9, 10]
    assert out.columns == ["doc_id", "url"]       # helper cols dropped


def test_robots_filter_specific_agent_and_annotate(spark):
    out = robots_filter(_pages(spark), _robots(spark), agent="canarybot",
                        keep_col="robots_ok", broadcast_rules=False)
    flags = {r.doc_id: r.robots_ok for r in out.collect()}
    # b.example: canarybot group (Disallow: /) replaces the * group
    assert flags[6] is True or flags[6] is False  # present for all rows
    assert flags[7] is False
    assert flags[6] is False
    # a.example rules unchanged for canarybot (only * group there)
    assert flags[2] is True and flags[1] is False
    assert len(flags) == 10                        # annotate keeps rows


def test_parse_robots_compiles_per_host(spark):
    compiled = parse_robots(_robots(spark), agent="*")
    rows = {r.host: r._rules for r in compiled.collect()}
    assert set(rows) == {"a.example", "b.example"}
    assert len(rows["a.example"]) == 3
    # plen is octet length of the raw pattern
    assert sorted(r.plen for r in rows["a.example"]) == [7, 9, 11]


def test_robots_filter_plan_is_broadcast_and_udf_free_on_pages(spark):
    out = robots_filter(_pages(spark), _robots(spark))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # the only Python stage is the host-count rule compile, never pages
    assert plan.count("ArrowEvalPython") <= 1


# ---------------------------------------------------------------------------
# curate integration (CLI --robots-table)
# ---------------------------------------------------------------------------

def test_curate_robots_stage(spark, tmp_path, capsys):
    """--robots-table enforces crawl policy before content stages:
    lineage shows docs_in -> after_robots, and no disallowed url
    survives to the corpus."""
    import json
    import os

    from pyspark.sql import functions as F2

    from datacanary_spark.cli import main

    pages = str(tmp_path / "pages")
    assert main(["gen-pages", "--output", pages, "--docs", "120",
                 "--files", "2"]) == 0
    capsys.readouterr()

    # fixture urls are https://host{i}.example.com/<path>; disallow
    # everything on host0 and one path prefix on host1
    h1_prefix = None
    for r in spark.read.parquet(pages).select("url").collect():
        if r.url and "host1.example.com" in r.url:
            from urllib.parse import urlparse
            h1_prefix = urlparse(r.url).path[:6]
            break
    robots = str(tmp_path / "robots")
    spark.createDataFrame(
        [("host0.example.com", "User-agent: *\nDisallow: /\n"),
         ("host1.example.com",
          f"User-agent: *\nDisallow: {h1_prefix}\n")],
        "host string, robots_txt string").write.parquet(robots)

    out = str(tmp_path / "curated")
    assert main(["curate", "--input", pages, "--output", out,
                 "--robots-table", robots]) == 0
    s = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s["docs_in"] == 120
    assert s["after_robots"] < 120

    corpus = spark.read.parquet(os.path.join(out, "corpus"))
    surviving = [r.url for r in corpus.select("url").collect()]
    assert all("host0.example.com" not in (u or "") for u in surviving)
    from urllib.parse import urlparse
    assert all(not (u and "host1.example.com" in u
                    and urlparse(u).path.startswith(h1_prefix))
               for u in surviving)
