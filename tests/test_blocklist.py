"""Domain blocklist filtering (text_analysis.filter_blocked_domains):
suffix semantics, null-host exemption, literal==join dispatch."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datacanary_spark.operators import text_analysis as ta


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "https://ads.evil.com/x"),          # suffix evil.com
            (2, "https://evil.com/y"),              # exact registrable
            (3, "https://EVIL.com:8443/z"),         # case + port
            (4, "https://notevil.com/a"),           # NOT a dot-suffix
            (5, "https://sub.tracker.net/b"),       # exact-host entry
            (6, "https://deep.sub.tracker.net/c"),  # suffix of exact-host
            (7, "https://clean.org/d"),
            (8, None),                              # null url → exempt
            (9, "mailto:x@y"),                      # non-hierarchical → exempt
        ],
        "doc_id long, url string")


BLOCK = ["evil.com", "sub.tracker.net"]


def test_suffix_expr_most_specific_first(spark):
    row = spark.sql("SELECT 'a.b.example.com' AS h").select(
        ta.domain_suffixes_expr(F.col("h")).alias("s")).collect()[0]
    assert row["s"] == ["a.b.example.com", "b.example.com",
                        "example.com", "com"]


def test_blocklist_host_expr(spark):
    rows = _docs(spark).select(
        "doc_id", ta.blocklist_host_expr(F.col("url")).alias("h")).collect()
    h = {r["doc_id"]: r["h"] for r in rows}
    assert h[3] == "evil.com"          # lowercased, port stripped
    assert h[1] == "ads.evil.com"      # www/subdomain kept
    assert h[8] is None and h[9] is None


@pytest.mark.parametrize("mode", ["literal", "join"])
def test_filter_blocked_domains_semantics(spark, mode):
    out = ta.filter_blocked_domains(_docs(spark), BLOCK, mode=mode)
    ids = sorted(r["doc_id"] for r in out.collect())
    # 1,2,3 blocked by evil.com; 5,6 by sub.tracker.net;
    # 4 survives (notevil.com is not a dot-suffix match);
    # 8,9 survive (null host exempt)
    assert ids == [4, 7, 8, 9]
    assert "url" in out.columns and "_bl_host" not in out.columns


def test_literal_join_dispatch_agree_and_keep_host(spark):
    lit = ta.filter_blocked_domains(_docs(spark), BLOCK, mode="literal",
                                    keep_host="host")
    join = ta.filter_blocked_domains(_docs(spark), BLOCK, mode="join",
                                     keep_host="host")
    assert sorted(map(tuple, lit.collect())) \
        == sorted(map(tuple, join.collect()))
    assert "host" in lit.columns


def test_blocklist_dataframe_input_and_errors(spark):
    bl = spark.createDataFrame([("EVIL.com",)], "domain string")
    out = ta.filter_blocked_domains(_docs(spark), bl)  # auto → join, lowered
    assert sorted(r["doc_id"] for r in out.collect()) == [4, 5, 6, 7, 8, 9]
    with pytest.raises(ValueError):
        ta.filter_blocked_domains(_docs(spark), bl, mode="literal")
    with pytest.raises(ValueError):
        ta.filter_blocked_domains(_docs(spark), BLOCK, mode="bogus")


def test_blocklist_adversarial_url_forms(spark):
    """Forms an adversary controls must not bypass the filter:
    userinfo hiding the host from a naive authority regex, and
    trailing-dot FQDNs that resolve identically in DNS."""
    docs = spark.createDataFrame(
        [
            (1, "https://anything@evil.com/x"),     # userinfo
            (2, "https://a:b@sub.evil.com:99/x"),   # userinfo+port
            (3, "https://evil.com./x"),             # trailing dot
            (4, "https://evil.com.:443/x"),         # trailing dot + port
            (5, "https://clean.org/x"),
            (6, "https://@/x"),                     # degenerate: no host
        ],
        "doc_id long, url string")
    for mode in ("literal", "join"):
        out = ta.filter_blocked_domains(docs, ["evil.com"], mode=mode)
        ids = sorted(r["doc_id"] for r in out.collect())
        # 6 survives: empty host → null → exempt (unknown origin)
        assert ids == [5, 6], (mode, ids)


def test_parse_blocklist_arg_disambiguation(tmp_path):
    from datacanary_spark.cli import parse_blocklist_arg

    assert parse_blocklist_arg(None) is None
    assert parse_blocklist_arg("/data/bl.parquet") == "/data/bl.parquet"
    assert parse_blocklist_arg("a.com,b.org") == ["a.com", "b.org"]
    assert parse_blocklist_arg("a.com") == ["a.com"]
    # a bare cwd-relative table name that EXISTS is a path, not a
    # one-entry "domain" that silently never matches
    import os
    p = tmp_path / "domains.parquet"
    p.write_text("x")
    old = os.getcwd()
    os.chdir(tmp_path)
    try:
        assert parse_blocklist_arg("domains.parquet") == "domains.parquet"
    finally:
        os.chdir(old)


def test_url_pattern_blocked_expr_and_filter(spark):
    docs = spark.createDataFrame(
        [(1, "https://a.com/tag/x"),        # path pattern
         (2, "https://a.com/dl/f.zip"),     # suffix pattern
         (3, "https://a.com/p?sessionid=9"),  # query pattern
         (4, "https://a.com/article/ok"),   # clean
         (5, None)],                         # null url — exempt
        "doc_id bigint, url string")
    pats = ["/tag/", r"\.zip$", "[?&]sessionid="]
    out = ta.filter_blocked_url_patterns(docs, pats)
    assert sorted(r.doc_id for r in out.collect()) == [4, 5]
    # empty pattern list is the identity
    assert ta.filter_blocked_url_patterns(docs, []).count() == 5
    # mid-string .zip does NOT hit the anchored suffix pattern
    more = spark.createDataFrame([(6, "https://a.com/f.zip/view")],
                                 "doc_id bigint, url string")
    assert ta.filter_blocked_url_patterns(more, pats).count() == 1


def test_curate_block_url_patterns_stage(spark, tmp_path):
    import os

    from datacanary_spark.cli import main
    from datacanary_spark.plans.curate import run_curation_job

    pages = str(tmp_path / "pages")
    assert main(["gen-pages", "--output", pages, "--docs", "60",
                 "--files", "2"]) == 0
    src = spark.read.parquet(pages)
    # plant a blockable query-string variant of a few urls
    spiked = src.unionByName(
        src.limit(4).withColumn(
            "url", F.concat(F.col("url"), F.lit("?sessionid=z"))))
    pages2 = str(tmp_path / "pages2")
    spiked.write.parquet(pages2)

    s = run_curation_job(spark, pages2, str(tmp_path / "out"),
                         block_url_patterns=["[?&]sessionid="])
    assert s["docs_in"] == 64
    assert s["after_url_patterns"] == 60
    corpus = spark.read.parquet(
        os.path.join(str(tmp_path / "out"), "corpus"))
    assert corpus.where(F.col("url").contains("sessionid")).count() == 0
