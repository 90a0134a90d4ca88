"""Opt-in page-structure rules in the filter pipeline (noindex +
link-farm density from raw html; plans/pipeline.py structure_rules)."""

from __future__ import annotations

import dataclasses

import pytest

from datacanary_spark.functions.heuristics import FilterConfig
from datacanary_spark.plans.pipeline import broadcast_models, filter_pages

# Text rules wide open so ONLY the structure rules decide the verdict:
# each test page carries ordinary prose that would pass real rules
# anyway, but pinning them out isolates the feature under test.
_PERMISSIVE = FilterConfig(
    min_words=1, max_words=10**6,
    min_mean_word_length=0.0, max_mean_word_length=1e6,
    max_symbol_to_word_ratio=1e6, min_stopword_fraction=0.0,
    max_dup_line_fraction=1e6, max_dup_trigram_fraction=1e6,
    max_bullet_line_fraction=1e6, max_ellipsis_line_fraction=1e6,
    max_ppl=1e18, min_lang_conf=0.0,
)

_TEXT = "the quick brown fox jumps over the lazy dog again and again"

_PAGES = [
    ("https://ok.example/a",
     b"<html><body><p>plenty of visible prose here with "
     b"no links at all</p></body></html>"),
    ("https://noidx.example/b",
     b'<html><head><meta name="robots" content="noindex,follow">'
     b"</head><body><p>fine prose otherwise</p></body></html>"),
    # anchors dominate: 40 anchor chars over ~46 visible -> density ~0.87
    ("https://farm.example/c",
     b'<html><body><a href="x">' + b"a" * 40 + b"</a>tinytag</body></html>"),
    ("https://textonly.example/d", None),  # WET-style row: text, no html
]

_SCHEMA = ("url string, warc_ts timestamp, html binary, "
           "text string, lang string")


def _pages_df(spark):
    rows = [(u, None, h, _TEXT, None) for u, h in _PAGES]
    return spark.createDataFrame(rows, _SCHEMA)


@pytest.fixture(scope="module")
def models_bc(spark):
    return broadcast_models(spark)


def test_structure_rules_drop_noindex_and_link_farm(spark, models_bc):
    out = filter_pages(_pages_df(spark), models_bc, cfg=_PERMISSIVE,
                       structure_rules=True)
    got = {r.url: r for r in out.collect()}
    assert got["https://ok.example/a"].keep is True
    assert got["https://noidx.example/b"].keep is False
    assert got["https://noidx.example/b"].rule_hits["noindex"] == 1
    assert got["https://noidx.example/b"].rule_hits["link_density"] == 0
    assert got["https://farm.example/c"].keep is False
    assert got["https://farm.example/c"].rule_hits["link_density"] == 1
    assert got["https://farm.example/c"].rule_hits["noindex"] == 0
    # NULL html is exempt from both structure rules, not dropped
    d = got["https://textonly.example/d"]
    assert d.keep is True
    assert d.rule_hits["noindex"] == 0
    assert d.rule_hits["link_density"] == 0


def test_default_off_keeps_rule_map_shape(spark, models_bc):
    out = filter_pages(_pages_df(spark), models_bc, cfg=_PERMISSIVE)
    got = {r.url: r for r in out.collect()}
    # without the flag the structure rules neither appear nor fire —
    # the golden rule_hits contract for text corpora is unchanged
    assert set(got["https://noidx.example/b"].rule_hits) \
        == set(_PERMISSIVE.rule_names)
    assert all(r.keep for r in got.values())


def test_rule_name_contract_matches_config(spark, models_bc):
    out = filter_pages(_pages_df(spark), models_bc, cfg=_PERMISSIVE,
                       structure_rules=True)
    keys = set(out.select("rule_hits").first().rule_hits)
    assert keys == set(_PERMISSIVE.rule_names
                       + _PERMISSIVE.structure_rule_names)


def test_structure_rule_selection_follows_config(spark, models_bc):
    # cfg.structure_rule_names is authoritative: asking for only noindex
    # must leave link_density out of the map and out of the verdict
    cfg = dataclasses.replace(_PERMISSIVE, structure_rule_names=("noindex",))
    out = filter_pages(_pages_df(spark), models_bc, cfg=cfg,
                       structure_rules=True)
    got = {r.url: r for r in out.collect()}
    farm = got["https://farm.example/c"]
    assert "link_density" not in farm.rule_hits
    assert farm.keep is True          # the farm rule wasn't requested
    assert got["https://noidx.example/b"].keep is False


def test_unknown_structure_rule_name_raises(spark, models_bc):
    cfg = dataclasses.replace(_PERMISSIVE,
                              structure_rule_names=("noindex", "nosuch"))
    with pytest.raises(ValueError, match="nosuch"):
        filter_pages(_pages_df(spark), models_bc, cfg=cfg,
                     structure_rules=True)


def test_lineage_histogram_covers_structure_rules(spark, models_bc):
    from datacanary_spark.plans.lineage import (
        corpus_metrics,
        partition_lineage,
    )

    v = filter_pages(_pages_df(spark), models_bc, cfg=_PERMISSIVE,
                     structure_rules=True)
    lin = partition_lineage(v, _PERMISSIVE, structure_rules=True).collect()
    hist = {}
    for row in lin:
        for k, n in row.rule_hit_histogram.items():
            hist[k] = hist.get(k, 0) + n
    # the drops this corpus has are EXPLAINED by the histogram
    assert hist["noindex"] == 1
    assert hist["link_density"] == 1
    cm = corpus_metrics(v, _PERMISSIVE, structure_rules=True).collect()[0]
    assert cm.rule_hit_histogram["noindex"] == 1
    assert cm.rule_hit_histogram["link_density"] == 1


def test_extraction_creates_text_column_when_absent(spark, models_bc):
    # raw (url, warc_ts, html) frames — no text column at all — are the
    # documented html-to-text use of the seam; the extractor must CREATE
    # the column, not reference a nonexistent one
    rows = [("https://raw.example/f", None,
             b"<html><body><p>the raw crawl page body words</p>"
             b"</body></html>")]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, "
                                     "html binary")
    out = filter_pages(df, models_bc, cfg=_PERMISSIVE,
                       extract_from_html=True, extractor="real").collect()[0]
    assert "raw crawl page body" in out.scrubbed_text
    assert out.keep is True


def test_requires_html_column(spark, models_bc):
    df = spark.createDataFrame(
        [("u", _TEXT)], "url string, text string")
    with pytest.raises(ValueError, match="html"):
        filter_pages(df, models_bc, structure_rules=True)


def test_no_new_python_boundary(spark, models_bc):
    # structure rules are Column expressions: the number of Python/Arrow
    # eval stages in the plan must not grow when they're enabled
    base = filter_pages(_pages_df(spark), models_bc, cfg=_PERMISSIVE) \
        ._jdf.queryExecution().executedPlan().toString()
    with_sr = filter_pages(_pages_df(spark), models_bc, cfg=_PERMISSIVE,
                           structure_rules=True) \
        ._jdf.queryExecution().executedPlan().toString()
    assert with_sr.count("EvalPython") == base.count("EvalPython")
    assert "Exchange" not in with_sr.replace(
        base, "")  # no stray shuffle introduced


def test_structure_plus_extraction_compose(spark, models_bc):
    # extraction consumes html AFTER the structure exprs read it: a page
    # whose text arrives from its own html still gets structure verdicts
    rows = [("https://x.example/e", None,
             b'<html><head><meta name="robots" content="NOINDEX"></head>'
             b"<body><p>words in the body of this page</p></body></html>",
             None, None)]
    df = spark.createDataFrame(rows, _SCHEMA)
    out = filter_pages(df, models_bc, cfg=_PERMISSIVE,
                       extract_from_html=True, extractor="real",
                       structure_rules=True).collect()[0]
    assert out.rule_hits["noindex"] == 1 and out.keep is False
    assert "words in the body" in out.scrubbed_text
