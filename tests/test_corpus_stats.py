"""Corpus-curation operators: vocabulary head, deterministic stratified
sampling, URL canonicalization."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from datacanary_spark.operators import corpus_stats as cs
from datacanary_spark.operators.text_analysis import canonical_url_expr


def test_top_terms_deterministic_tiebreak(spark):
    rows = [("en", "a a a b b c"), ("en", "b z"), ("de", "x y x")]
    df = spark.createDataFrame(rows, "lang: string, text: string")
    got = [(r["lang"], r["term"], r["n"], r["rank"]) for r in
           cs.top_terms_by_group(df, "text", "lang", k=2)
             .orderBy("lang", "rank").collect()]
    # en: a=3, b=3 -> tie broken term-asc; de: x=2, y=1
    assert got == [("de", "x", 2, 1), ("de", "y", 1, 2),
                   ("en", "a", 3, 1), ("en", "b", 3, 2)]


def test_hash_sample_deterministic_and_partition_invariant(spark):
    df = spark.range(0, 4000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("de").alias("lang"))
    frac = {"en": 0.5, "de": 0.1}

    def ids(d):
        return {r["doc_id"] for r in
                cs.hash_stratified_sample(d, "lang", frac, "doc_id").collect()}

    a = ids(df.repartition(1))
    b = ids(df.repartition(16, "doc_id"))
    assert a == b  # pure function of the key: partitioning-invariant

    # matches an independent Python twin exactly
    def py_keep(i, f):
        return hashlib.md5(f"sample:{i}".encode()).hexdigest()[:8] \
            < f"{int(round(f * 16**8)):08x}"

    exp = {i for i in range(4000)
           if py_keep(i, frac["en" if i % 2 == 0 else "de"])}
    assert a == exp
    # and the rates are in the right ballpark
    n_en = sum(1 for i in a if i % 2 == 0)
    n_de = sum(1 for i in a if i % 2 == 1)
    assert abs(n_en / 2000 - 0.5) < 0.05
    assert abs(n_de / 2000 - 0.1) < 0.03

    with pytest.raises(ValueError):
        cs.hash_stratified_sample(df, "lang", {"en": 1.5}, "doc_id")

    # boundary fractions: 1.0 keeps EVERY row of the stratum (16^8
    # formats to nine hex digits — the sentinel threshold must not let
    # lexicographic compare silently keep ~1/16), 0.0 keeps none
    edge = cs.hash_stratified_sample(df, "lang", {"en": 1.0, "de": 0.0},
                                     "doc_id")
    assert edge.where(F.col("lang") == "en").count() == 2000
    assert edge.where(F.col("lang") == "de").count() == 0


def test_hash_sample_predicate_agrees_with_stratified(spark):
    """The standalone predicate and the stratified operator must select
    the same rows (single shared bucket/threshold implementation)."""
    df = spark.range(0, 1000).select(F.col("id").alias("doc_id"),
                                     F.lit("en").alias("lang"))
    via_pred = {r["doc_id"] for r in df.where(
        cs.hash_sample_predicate(F.col("doc_id"), 0.3)).collect()}
    via_strat = {r["doc_id"] for r in cs.hash_stratified_sample(
        df, "lang", {"en": 0.3}, "doc_id").collect()}
    assert via_pred == via_strat and 200 < len(via_pred) < 400


def test_canonical_url_random_differential(spark):
    """Seeded random URLs (mixed case, ports, params in random order,
    fragments, empty queries) — Spark canonicalization must match an
    independent Python twin of the documented rules exactly."""
    import random
    import re

    rng = random.Random(20260817)
    urls = []
    for _ in range(120):
        scheme = rng.choice(["http", "HTTP", "https", "HTTPS", "ftp"])
        host = rng.choice(["Example.COM", "www.Site.org", "WWW.a-b.net",
                           "host.io"])
        port = rng.choice(["", ":80", ":443", ":8080"])
        segs = rng.randint(0, 3)
        path = "".join("/" + rng.choice(["Alpha", "b", "C9"])
                       for _ in range(segs))
        path += rng.choice(["", "/"])
        params = rng.sample(["utm_source=x", "utm_campaign=Y", "fbclid=z",
                             "gclid=1", "id=5", "b=2", "q=hello", "empty=",
                             "utm_source", "fbclid", "flag"],
                            rng.randint(0, 6))
        query = "?" + "&".join(params) if params else rng.choice(["", "?"])
        frag = rng.choice(["", "#sec", "#a?b=1"])
        urls.append(f"{scheme}://{host}{port}{path}{query}{frag}")

    def py_canon(u):
        u = re.sub(r"#.*$", "", u)
        m = re.match(r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]+)(.*)$", u)
        scheme, host, rest = m.group(1).lower(), m.group(2).lower(), m.group(3)
        host = re.sub(r"^www\.", "", host)
        if scheme == "http":
            host = re.sub(r":80$", "", host)
        elif scheme == "https":
            host = re.sub(r":443$", "", host)
        path = re.sub(r"/$", "", re.match(r"^([^?]*)", rest).group(1))
        qm = re.search(r"\?(.*)$", rest)
        params = sorted(
            p for p in (qm.group(1) if qm else "").split("&")
            if p and not re.match(r"^(utm_[^=]*|fbclid|gclid)(=|$)", p))
        return scheme + "://" + host + path + \
            ("?" + "&".join(params) if params else "")

    df = spark.createDataFrame(list(enumerate(urls)), "i: int, url: string")
    got = {r["i"]: r["c"] for r in df.select(
        "i", canonical_url_expr(F.col("url")).alias("c")).collect()}
    for i, u in enumerate(urls):
        assert got[i] == py_canon(u), (u, got[i], py_canon(u))


def test_canonical_url_rules(spark):
    cases = [
        # case/port/www/fragment/tracking/sort/trailing slash all at once
        ("HTTPS://WWW.Example.COM:443/Path/sub/?utm_source=x&id=5&b=2#frag",
         "https://example.com/Path/sub?b=2&id=5"),
        ("http://Host.org:80/a", "http://host.org/a"),
        ("http://host.org:8080/a", "http://host.org:8080/a"),  # non-default
        ("https://host.org/", "https://host.org"),
        ("https://host.org/p?fbclid=abc", "https://host.org/p"),
        ("https://host.org/p?gclid=1&keep=2", "https://host.org/p?keep=2"),
        # valueless tracking params are tracking params too; valueless
        # NON-tracking params survive
        ("https://host.org/p?utm_source", "https://host.org/p"),
        ("https://host.org/p?fbclid&keep=1", "https://host.org/p?keep=1"),
        ("https://host.org/p?flag", "https://host.org/p?flag"),
        # a param merely PREFIXED by a tracking name is not tracking
        ("https://host.org/p?fbclidx=1", "https://host.org/p?fbclidx=1"),
        ("https://host.org", "https://host.org"),
        (None, None),
        # non-hierarchical / scheme-less urls have UNKNOWN identity →
        # NULL (exempt from grouping), never a shared "://" key that
        # would collapse distinct malformed docs into one dedup group
        ("example.com/a", None),
        ("mailto:x@y.z", None),
        ("://nohost", None),
        ("https://", None),
        ("", None),
    ]
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(cases)],
                               "i: int, url: string")
    got = {r["i"]: r["c"] for r in df.select(
        "i", canonical_url_expr(F.col("url")).alias("c")).collect()}
    for i, (_, exp) in enumerate(cases):
        assert got[i] == exp, (i, got[i], exp)


def test_cap_per_group_prefilter_matches_exact(spark):
    """The prefiltered scale path must select the IDENTICAL survivors
    as the exact window form (the hash filter keeps a prefix of the
    hash order), and never exceed the cap."""
    from datacanary_spark.operators.corpus_stats import cap_per_group

    rows = [(i, f"host{i % 4}") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id: long, host: string")
    exact = {(r["host"], r["doc_id"]) for r in
             cap_per_group(df, "host", 60, "doc_id").collect()}
    fast = {(r["host"], r["doc_id"]) for r in
            cap_per_group(df, "host", 60, "doc_id",
                          prefilter=True).collect()}
    assert exact == fast
    per_host = {}
    for h, _ in exact:
        per_host[h] = per_host.get(h, 0) + 1
    assert all(v == 60 for v in per_host.values())
    # a group smaller than the cap keeps everything
    small = spark.createDataFrame([(1, "h"), (2, "h")],
                                  "doc_id: long, host: string")
    assert cap_per_group(small, "host", 60, "doc_id",
                         prefilter=True).count() == 2


def test_cap_per_group_exempt_null_group(spark):
    """NULL group keys (unparseable-URL hosts) are distinct documents,
    not one spam host: with exempt_null_group=True they pass through
    uncapped while real groups are still capped; default semantics
    (NULL is a real group, the oracle twin) are unchanged."""
    from datacanary_spark.operators.corpus_stats import cap_per_group

    rows = [(i, "hot.example") for i in range(40)] + \
           [(100 + i, None) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id: long, host: string")

    exempt = cap_per_group(df, "host", 3, "doc_id",
                           exempt_null_group=True)
    by_host = {r["host"]: r["n"] for r in
               exempt.groupBy("host")
                     .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert by_host == {"hot.example": 3, None: 10}
    assert exempt.columns == df.columns

    # default: NULL is a real group and gets capped (oracle twin form)
    default = cap_per_group(df, "host", 3, "doc_id")
    assert default.where(F.col("host").isNull()).count() == 3

    # prefilter composes with the exemption and picks the same rows
    fast = cap_per_group(df, "host", 3, "doc_id",
                         exempt_null_group=True, prefilter=True)
    assert ({tuple(r) for r in fast.collect()}
            == {tuple(r) for r in exempt.collect()})


def test_distributed_cumsum_matches_serial_and_handles_nulls(spark):
    """The bucketed two-pass prefix sum must equal the serial
    single-window form row-for-row, including null values (sum ignores
    them; the row still gets the running total so far)."""
    from pyspark.sql import Window

    from datacanary_spark.operators.corpus_stats import distributed_cumsum

    rows = [(i * 3 + 1, float(i % 7) if i % 11 else None)
            for i in range(500)]
    df = spark.createDataFrame(rows, "id: long, v: double")
    got = {r["id"]: r["cum"] for r in
           distributed_cumsum(df, "id", "v", n_parts=8).collect()}
    w = Window.orderBy("id")
    exp = {r["id"]: r["c"] for r in
           df.withColumn("c", F.sum("v").over(w).cast("long")).collect()}
    assert got == exp
    # empty frame: defined, all-null output column
    empty = spark.createDataFrame([], "id: long, v: double")
    assert distributed_cumsum(empty, "id", "v").count() == 0


def test_assign_token_shards_budget_and_determinism(spark):
    """Shards are dense from 0, no shard exceeds the budget by more
    than one document's tokens (greedy packing), null text rides along
    with 0 tokens, and re-running yields the identical assignment."""
    from datacanary_spark.operators.corpus_stats import assign_token_shards

    rows = [(i, "tok " * (i % 50)) for i in range(300)] + [(300, None)]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    out = assign_token_shards(df, 200).orderBy("doc_id").collect()
    assert [r["doc_id"] for r in out] == list(range(301))
    shards = [r["shard"] for r in out]
    assert shards[0] == 0 and sorted(set(shards)) == list(range(max(shards) + 1))
    again = assign_token_shards(df, 200).orderBy("doc_id").collect()
    assert [r["shard"] for r in again] == shards
    # greedy budget: the doc STARTING a shard begins before the budget
    # boundary; cumulative tokens at each shard start < (shard+1)*budget
    tok = [len([w for w in (r["text"] or "").split() if w]) for r in out]
    cum = 0
    for i, r in enumerate(out):
        assert r["shard"] == cum // 200
        cum += tok[i]


def test_pack_sequences_hand_computed(spark):
    """Concat-and-chunk at seq_len=10 over token counts [4,7,0,12,5]:
    window ids and boundary-split counts match the serial form; empty
    docs occupy no tokens (last_seq == first_seq); re-runs agree."""
    from datacanary_spark.operators.corpus_stats import pack_sequences

    rows = [(1, "a b c d"),          # toks 1..4   → seq 0
            (2, "w " * 7),           # toks 5..11  → seqs 0-1, 1 split
            (3, None),               # empty — rides at seq 1
            (4, "w " * 12),          # toks 12..23 → seqs 1-2, 1 split
            (5, "w " * 5)]           # toks 24..28 → seq 2
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    out = {r["doc_id"]: r for r in pack_sequences(df, 10).collect()}
    got = [(out[i]["first_seq"], out[i]["last_seq"], out[i]["n_splits"])
           for i in range(1, 6)]
    assert got == [(0, 0, 0), (0, 1, 1), (1, 1, 0), (1, 2, 1), (2, 2, 0)]
    # serial differential on a bigger corpus: every doc vs a python replay
    rows = [(i, None if i % 11 == 3 else "tok " * (i % 37)) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    out = {r["doc_id"]: r for r in pack_sequences(df, 100).collect()}
    cum = 0
    for i in range(400):
        t = len((rows[i][1] or "").split())
        first = cum // 100
        last = (cum + t - 1) // 100 if t else first
        r = out[i]
        assert (r["first_seq"], r["last_seq"], r["n_splits"]) == \
            (first, last, last - first), f"doc {i}"
        cum += t


def test_approx_quantile_buckets_scale_twin(spark):
    """The bounded-state bucket path: roughly balanced buckets, no
    window in the plan, null values → null bucket, and boundaries
    consistent with the exact decile query's semantics (every bucket's
    values strictly ordered between its neighbors')."""
    rows = [(i, "en", float((i * 37) % 1000)) for i in range(1000)] \
        + [(2000, "en", None)]
    df = spark.createDataFrame(rows, "doc_id: long, lang: string, v: double")
    out = cs.approx_quantile_buckets(df, "v", "lang", n_buckets=10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan  # the whole point of the scale path
    rowsb = out.collect()
    got = {r["doc_id"]: r["bucket"] for r in rowsb}
    assert got[2000] is None
    sizes = {}
    for r in rowsb:
        if r["bucket"] is not None:
            sizes[r["bucket"]] = sizes.get(r["bucket"], 0) + 1
    assert set(sizes) == set(range(1, 11))
    assert all(60 <= n <= 140 for n in sizes.values()), sizes
    # bucket ordering is consistent with value ordering
    by_bucket = {}
    for r in rowsb:
        if r["bucket"] is not None:
            by_bucket.setdefault(r["bucket"], []).append(r["v"])
    for b in range(1, 10):
        assert max(by_bucket[b]) <= min(by_bucket[b + 1])


def test_distributed_cumsum_negative_values_and_null_boundary(spark):
    """Review regressions: (a) negative values — per-bucket totals
    must be SUMs, a running max gave cum=6 instead of 3; (b) a null
    value landing FIRST in a non-first bucket must still get the
    running offset (null + offset was null); (c) an all-null prefix
    stays null like the serial window."""
    from pyspark.sql import Window

    from datacanary_spark.operators.corpus_stats import distributed_cumsum

    rows = [(1, 5.0), (2, -3.0), (100, 1.0),     # negative inside bucket 0
            (150, None), (151, 2.0),             # null first in a bucket
            (-50, None)]                         # all-null global prefix
    df = spark.createDataFrame(rows, "id: long, v: double")
    for n_parts in (2, 3, 8):
        got = {r["id"]: r["cum"] for r in
               distributed_cumsum(df, "id", "v", n_parts=n_parts).collect()}
        w = Window.orderBy("id")
        exp = {r["id"]: r["c"] for r in
               df.withColumn("c", F.sum("v").over(w).cast("long")).collect()}
        assert got == exp, (n_parts, got, exp)
    assert got[-50] is None and got[2] == 2 and got[100] == 3
    assert got[150] == 3 and got[151] == 5


def test_cap_and_buckets_keep_null_groups(spark):
    """Review regressions: rows whose GROUP key is null must survive
    both scale paths (equality joins on a null key silently deleted
    them) exactly like the window forms keep them."""
    from datacanary_spark.operators.corpus_stats import (
        approx_quantile_buckets,
        cap_per_group,
    )

    rows = [(i, None if i < 5 else "h", float(i)) for i in range(15)]
    df = spark.createDataFrame(rows, "doc_id: long, host: string, v: double")

    exact = {(r["host"], r["doc_id"]) for r in
             cap_per_group(df, "host", 3, "doc_id").collect()}
    fast = {(r["host"], r["doc_id"]) for r in
            cap_per_group(df, "host", 3, "doc_id", prefilter=True).collect()}
    assert exact == fast
    assert sum(1 for h, _ in exact if h is None) == 3  # null group capped too

    out = approx_quantile_buckets(df, "v", "host", n_buckets=2)
    assert out.count() == 15  # nothing dropped
    null_rows = [r for r in out.collect() if r["host"] is None]
    assert len(null_rows) == 5 and all(r["bucket"] in (1, 2)
                                       for r in null_rows)


def test_temperature_fractions_math(spark):
    import math

    from datacanary_spark.operators.corpus_stats import temperature_fractions

    rows = ([("a", i) for i in range(100)] + [("b", i) for i in range(400)]
            + [("c", i) for i in range(2500)] + [(None, 0)])
    df = spark.createDataFrame(rows, "lang string, k int")

    fr = temperature_fractions(df, "lang", alpha=0.5)
    assert fr == {"a": 1.0, "b": 0.5, "c": 0.2}   # sqrt(n_min/n)
    assert None not in fr                          # null stratum exempt

    assert temperature_fractions(df, "lang", alpha=1.0) == \
        {"a": 1.0, "b": 1.0, "c": 1.0}             # alpha=1: no resampling
    fr0 = temperature_fractions(df, "lang", alpha=0.0)
    assert fr0["a"] == 1.0 and math.isclose(fr0["b"], 0.25) \
        and math.isclose(fr0["c"], 0.04)           # alpha=0: equal effective

    import pytest as _pytest
    with _pytest.raises(ValueError, match="alpha"):
        temperature_fractions(df, "lang", alpha=1.5)


def test_temperature_sample_deterministic_and_rebalanced(spark):
    from datacanary_spark.operators.corpus_stats import temperature_sample

    d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    s1 = temperature_sample(d, "lang", "doc_id", alpha=0.5)
    s2 = temperature_sample(d, "lang", "doc_id", alpha=0.5)
    ids1 = sorted(r.doc_id for r in s1.select("doc_id").collect())
    assert ids1 == sorted(r.doc_id for r in s2.select("doc_id").collect())

    before = {r.lang: r.n for r in
              d.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    after = {r.lang: r.n for r in
             s1.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    n_min = min(before.values())
    for lang, n in before.items():
        expected = (n_min / n) ** 0.5 * n
        assert abs(after.get(lang, 0) - expected) <= max(10, 0.25 * expected)


def test_temperature_fractions_token_weighted(spark):
    from datacanary_spark.operators.corpus_stats import temperature_fractions

    rows = ([("a", 10) for _ in range(10)]        # 100 tokens
            + [("b", 40) for _ in range(10)]      # 400 tokens
            + [("c", 250) for _ in range(10)]     # 2500 tokens
            + [("a", None)])                      # null weight -> 0
    df = spark.createDataFrame(rows, "lang string, tokens int")
    fr = temperature_fractions(df, "lang", alpha=0.5, weight_col="tokens")
    assert fr == {"a": 1.0, "b": 0.5, "c": 0.2}   # sqrt(mass_min/mass)


# ---------------------------------------------------------------------------
# ccnet_buckets (head/middle/tail quantile banding)
# ---------------------------------------------------------------------------


def test_ccnet_buckets_tercile_semantics(spark):
    import numpy as np

    rows = [(i, "en", float(i)) for i in range(30)] \
        + [(100 + i, "de", float(i * 10)) for i in range(9)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, v double")
    out = cs.ccnet_buckets(df, "v", "lang", out_col="band")
    got = {(r["lang"], r["doc_id"]): r["band"] for r in out.collect()}
    for lang, vals in (("en", [float(i) for i in range(30)]),
                       ("de", [float(i * 10) for i in range(9)])):
        c1, c2 = np.quantile(vals, [1.0 / 3.0, 2.0 / 3.0],
                             method="linear")
        for (lg, did), band in got.items():
            if lg != lang:
                continue
            v = vals[did % 100]
            expect = "head" if v <= c1 else ("middle" if v <= c2 else "tail")
            assert band == expect, (lg, did, v, c1, c2, band)


def test_ccnet_buckets_null_group_and_null_values(spark):
    df = spark.createDataFrame(
        [(1, None, 1.0), (2, None, 2.0), (3, None, 3.0),
         (4, "en", None)],
        "doc_id long, lang string, v double")
    out = cs.ccnet_buckets(df, "v", "lang", out_col="band").collect()
    by_id = {r["doc_id"]: r["band"] for r in out}
    # null group survives (eqNullSafe) and bands within itself
    assert by_id[1] == "head" and by_id[3] == "tail"
    # null value → null band, row retained
    assert 4 in by_id and by_id[4] is None


def test_ccnet_buckets_approx_mode_and_errors(spark):
    import pytest

    df = spark.createDataFrame(
        [(i, "en", float(i)) for i in range(300)],
        "doc_id long, lang string, v double")
    exact = cs.ccnet_buckets(df, "v", "lang", out_col="band")
    approx = cs.ccnet_buckets(df, "v", "lang", exact=False,
                              accuracy=10000, out_col="band")
    # high-accuracy sketch on a small group = same bands
    assert sorted(map(tuple, exact.collect())) \
        == sorted(map(tuple, approx.collect()))
    with pytest.raises(ValueError):
        cs.ccnet_buckets(df, "v", "lang", cuts=(0.5,),
                         labels=("a", "b", "c"))


# ---------------------------------------------------------------------------
# tfidf_top_terms / host_reputation
# ---------------------------------------------------------------------------


def test_tfidf_matches_hand_computation(spark):
    import math

    docs = [(1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "cherry date date date")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = cs.tfidf_top_terms(df, "text", "doc_id", k=2)
    got = {(r["doc_id"], r["term"]): (r["tf"], r["df"],
                                      round(r["score"], 10), r["rank"])
           for r in out.collect()}
    # df: apple 1, banana 2, cherry 2, date 1 ; N = 3
    assert got[(1, "apple")] == (2, 1, round(2 * math.log(3 / 1), 10), 1)
    assert got[(1, "banana")] == (1, 2, round(math.log(3 / 2), 10), 2)
    assert got[(3, "date")][3] == 1 and got[(3, "cherry")][3] == 2
    # k bound respected
    assert all(r[3] <= 2 for r in got.values())


def test_tfidf_min_df_prunes_and_ties_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "zz aa"), (2, "aa zz")], "doc_id long, text string")
    # equal scores → term asc wins
    out = cs.tfidf_top_terms(df, "text", "doc_id", k=1)
    assert {(r["doc_id"], r["term"]) for r in out.collect()} \
        == {(1, "aa"), (2, "aa")}
    # min_df=2 keeps both shared terms; a hapax would vanish
    df2 = spark.createDataFrame(
        [(1, "aa unique"), (2, "aa")], "doc_id long, text string")
    out2 = cs.tfidf_top_terms(df2, "text", "doc_id", k=5, min_df=2)
    assert {r["term"] for r in out2.collect()} == {"aa"}


def test_host_reputation_semantics(spark):
    rows = [
        (f"https://good.com/{i}", f"unique text {i}", 0.9) for i in range(4)
    ] + [
        ("https://spam.com/1", "same spam text", 0.2),
        ("https://spam.com/2", "same spam text", 0.4),
        ("https://SPAM.com:8080/3", "same  spam   text", 0.6),  # ws-variant
        (None, "orphan", 0.5),               # null url → excluded
        ("not-a-url", "orphan2", 0.5),       # unparseable → excluded
    ]
    df = spark.createDataFrame(rows, "url string, text string, q double")
    out = {r["host"]: r for r in
           cs.host_reputation(df, quality_col="q").collect()}
    assert set(out) == {"good.com", "spam.com"}
    g, s = out["good.com"], out["spam.com"]
    assert g["n_docs"] == 4 and g["n_distinct"] == 4
    assert g["distinct_ratio"] == 1.0 and g["mean_quality"] == 0.9
    # normalization collapses the whitespace variant onto one fingerprint
    assert s["n_docs"] == 3 and s["n_distinct"] == 1
    assert s["distinct_ratio"] == round(1 / 3, 6)
    assert s["mean_quality"] == round((0.2 + 0.4 + 0.6) / 3, 6)
    # min_docs filter
    only = cs.host_reputation(df, min_docs=4).collect()
    assert [r["host"] for r in only] == ["good.com"]
    # approx mode returns same counts at this scale (HLL exact for tiny sets)
    ax = {r["host"]: r["n_distinct"]
          for r in cs.host_reputation(df, approx=True).collect()}
    assert ax == {"good.com": 4, "spam.com": 1}


# ---------------------------------------------------------------------------
# epoch_upsample (fractional-epoch mixture replication)
# ---------------------------------------------------------------------------


def test_epoch_upsample_copy_counts_and_epochs(spark):
    df = spark.createDataFrame(
        [(i, "en" if i < 40 else ("fr" if i < 60 else "de"))
         for i in range(80)],
        "doc_id long, lang string")
    up = cs.epoch_upsample(df, "lang", {"en": 2.5, "fr": 0.25}, "doc_id")
    rows = up.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["epoch"])
    # en docs: 2 or 3 copies, epochs contiguous from 0
    en_counts = {d: sorted(e) for d, e in by_doc.items() if d < 40}
    assert all(e == list(range(len(e))) for e in en_counts.values())
    assert set(map(len, en_counts.values())) == {2, 3}
    # expected fraction of 3-copy docs ~ 0.5 (deterministic, just sane)
    n3 = sum(1 for e in en_counts.values() if len(e) == 3)
    assert 10 <= n3 <= 30
    # fr: kept docs have exactly 1 copy; some dropped
    fr = [d for d in by_doc if 40 <= d < 60]
    assert 0 < len(fr) < 20
    assert all(len(by_doc[d]) == 1 for d in fr)
    # de (unlisted) gets default weight 1.0 → exactly once
    assert all(len(by_doc[d]) == 1 for d in by_doc if d >= 60)


def test_epoch_upsample_determinism_and_membership_rule(spark):
    import hashlib

    df = spark.createDataFrame(
        [(i, "en") for i in range(50)], "doc_id long, lang string")
    up1 = sorted(map(tuple, cs.epoch_upsample(
        df, "lang", {"en": 1.5}, "doc_id").collect()))
    up2 = sorted(map(tuple, cs.epoch_upsample(
        df.repartition(7), "lang", {"en": 1.5}, "doc_id").collect()))
    assert up1 == up2  # partitioning-invariant
    # replica membership == the sampler's md5 rule, recomputed in Python
    thr = cs._hex_threshold(0.5)
    for doc_id in range(50):
        h = hashlib.md5(f"upsample:{doc_id}".encode()).hexdigest()[:8]
        expect = 2 if h < thr else 1
        got = sum(1 for t in up1 if t[0] == doc_id)
        assert got == expect, (doc_id, h, thr)


def test_epoch_upsample_edges(spark):
    import pytest

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None)], "doc_id long, lang string")
    # weight 0 drops the stratum; null stratum takes the default
    up = cs.epoch_upsample(df, "lang", {"a": 0.0, "b": 3.0}, "doc_id",
                           default_weight=2.0)
    got = {r["doc_id"]: r["epoch"] for r in up.collect()}
    counts = {d: sum(1 for r in up.collect() if r["doc_id"] == d)
              for d in (1, 2, 3)}
    assert counts == {1: 0, 2: 3, 3: 2}
    assert got[2] in (0, 1, 2)
    with pytest.raises(ValueError):
        cs.epoch_upsample(df, "lang", {"a": -1.0}, "doc_id")


# ---------------------------------------------------------------------------
# split_assign
# ---------------------------------------------------------------------------


def _py_split(key, fractions, salt="split"):
    """Python twin of split_assign's md5-threshold rule."""
    b = hashlib.md5(f"{salt}:{key}".encode()).hexdigest()[:8]
    cum = 0.0
    names = list(fractions)
    for name in names[:-1]:
        cum += fractions[name]
        if b < cs._hex_threshold(cum):
            return name
    return names[-1]


def test_split_assign_matches_python_twin_and_covers_all(spark):
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    df = spark.range(0, 3000).select(F.col("id").alias("doc_id"))
    got = {r["doc_id"]: r["split"] for r in
           cs.split_assign(df, "doc_id", fr).collect()}
    assert len(got) == 3000
    for k, v in got.items():
        assert v == _py_split(k, fr)
    # every split non-empty and roughly proportioned
    from collections import Counter
    c = Counter(got.values())
    assert set(c) == {"train", "val", "test"}
    assert 0.75 < c["train"] / 3000 < 0.85


def test_split_assign_partition_invariant_and_stable_under_growth(spark):
    fr = {"train": 0.5, "heldout": 0.5}
    a = spark.range(0, 500).select(F.col("id").alias("doc_id"))
    b = spark.range(0, 1000).repartition(7).select(
        F.col("id").alias("doc_id"))
    small = {r["doc_id"]: r["split"]
             for r in cs.split_assign(a, "doc_id", fr).collect()}
    big = {r["doc_id"]: r["split"]
           for r in cs.split_assign(b, "doc_id", fr).collect()}
    # adding data never moves an existing key across the boundary
    assert all(big[k] == v for k, v in small.items())


def test_split_assign_validation():
    with pytest.raises(ValueError):
        cs.split_assign(None, "k", {"train": 0.5, "val": 0.4})
    with pytest.raises(ValueError):
        cs.split_assign(None, "k", {"all": 1.0})


# ---------------------------------------------------------------------------
# shuffle_to_shards
# ---------------------------------------------------------------------------


def test_shuffle_to_shards_is_deterministic_permutation(spark):
    df = spark.range(0, 1000).select(F.col("id").alias("doc_id"))
    out = cs.shuffle_to_shards(df, "doc_id", 7)
    rows = out.collect()
    assert sorted(r["doc_id"] for r in rows) == list(range(1000))
    # shard matches the python rule; order key is the full digest
    for r in rows:
        dig = hashlib.md5(f"shuffle:{r['doc_id']}".encode()).hexdigest()
        assert r["shuffle_key"] == dig
        assert r["shard"] == int(dig[:8], 16) % 7
    # same input twice -> identical assignment
    again = {r["doc_id"]: r["shard"]
             for r in cs.shuffle_to_shards(df, "doc_id", 7).collect()}
    assert all(again[r["doc_id"]] == r["shard"] for r in rows)


def test_shuffle_to_shards_local_sort_within_partitions(spark):
    df = spark.range(0, 400).select(F.col("id").alias("doc_id"))
    out = cs.shuffle_to_shards(df, "doc_id", 5)

    def check(it):
        prev = None
        for row in it:
            key = (row["shard"], row["shuffle_key"])
            assert prev is None or key >= prev, "partition not sorted"
            prev = key
            yield row

    n = out.rdd.mapPartitions(check).count()
    assert n == 400
    with pytest.raises(ValueError):
        cs.shuffle_to_shards(df, "doc_id", 0)


def test_split_expr_and_leakage_stats(spark):
    fr = {"train": 0.6, "test": 0.4}
    # pairs engineered from real hash assignments so both leaked and
    # clean rows exist deterministically
    assign = {k: _py_split(k, fr) for k in range(100)}
    import itertools
    ids = list(range(100))
    pairs = [(a, b) for a, b in itertools.combinations(ids, 2)][:300]
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = {(r["split_a"], r["split_b"]): (r["n_pairs"], r["sum_ids"],
                                          r["leaked"])
           for r in cs.split_leakage_stats(df, fractions=fr).collect()}
    from collections import defaultdict
    want = defaultdict(lambda: [0, 0])
    for a, b in pairs:
        k = (assign[a], assign[b])
        want[k][0] += 1
        want[k][1] += a + b
    assert set(got) == set(want)
    for k, (n, s, leaked) in got.items():
        assert [n, s] == want[k]
        assert leaked == (k[0] != k[1])


def test_split_and_shard_null_keys_and_bad_fractions(spark):
    df = spark.createDataFrame([(1,), (None,)], "doc_id long")
    fr = {"train": 0.5, "test": 0.5}
    got = {r["doc_id"]: r["split"]
           for r in cs.split_assign(df, "doc_id", fr).collect()}
    assert got[1] == _py_split(1, fr)
    assert got[None] is None  # null key -> null split, both engines
    sh = {r["doc_id"]: (r["shard"], r["shuffle_key"])
          for r in cs.shuffle_to_shards(df, "doc_id", 3).collect()}
    assert sh[None] == (None, None)
    assert sh[1][1] is not None
    with pytest.raises(ValueError, match="> 0"):
        cs.split_assign(df, "doc_id", {"a": 1.0, "b": 0.0})
    with pytest.raises(ValueError, match="> 0"):
        cs.split_assign(df, "doc_id", {"a": 0.5, "b": -0.1, "c": 0.6})


def test_write_shards_one_file_per_shard(spark, tmp_path):
    df = spark.range(0, 300).select(F.col("id").alias("doc_id"))
    sharded = cs.shuffle_to_shards(df, "doc_id", 5)
    out = str(tmp_path / "shards")
    cs.write_shards(sharded, out)
    import glob
    for k in range(5):
        files = glob.glob(f"{out}/shard={k}/part-*.parquet")
        assert len(files) == 1, f"shard {k}: {files}"
    back = spark.read.parquet(out)
    assert sorted(r["doc_id"] for r in back.collect()) == list(range(300))


def test_corpus_diff_statuses(spark):
    old = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma"), (4, None), (5, None)],
        "doc_id long, text string")
    new = spark.createDataFrame(
        [(2, "beta"), (3, "gamma EDIT"), (4, None), (5, "now extracted"),
         (6, "new doc")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["status"]
           for r in cs.corpus_diff(old, new, id_col="doc_id").collect()}
    assert got == {1: "removed", 2: "unchanged", 3: "changed",
                   4: "unchanged",   # null fp both sides: null-safe eq
                   5: "changed",     # null -> extracted = change
                   6: "added"}


def test_corpus_diff_whitespace_insensitive(spark):
    old = spark.createDataFrame([(1, "a  b\nc")], "doc_id long, text string")
    new = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    [r] = cs.corpus_diff(old, new, id_col="doc_id").collect()
    assert r["status"] == "unchanged"  # fingerprint normalizes whitespace


def test_pearson_corr_matches_numpy_and_edge_cases(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    x = rng.integers(1, 1000, 200)
    y = (x * 3 + rng.integers(-50, 50, 200)).astype(int)
    rows = ([("a", int(a), int(b)) for a, b in zip(x, y)]
            + [("const", 1, i) for i in range(5)]       # zero x variance
            + [("b", 10, 20), ("b", None, 30), ("b", 20, 10)])  # null pair
    df = spark.createDataFrame(rows, "lang string, x long, y long")
    got = {r["lang"]: r for r in
           cs.pearson_corr_by_group(df, "x", "y", "lang").collect()}
    want = np.corrcoef(x, y)[0, 1]
    assert abs(got["a"]["r"] - want) < 1e-12
    assert got["const"]["r"] is None          # zero variance -> null
    assert got["b"]["n"] == 2                 # pairwise null exclusion
    assert got["b"]["r"] == -1.0


def test_pearson_corr_survives_int64_overflow_range(spark):
    # (sum_x)^2 here is ~2.3e20 — an int64 formulation wraps silently;
    # the decimal(38,0) path must return exactly 1.0
    rows = [("big", 3_000_000_000 + i, 3_000_000_000 + i)
            for i in range(5)]
    df = spark.createDataFrame(rows, "lang string, x long, y long")
    [r] = cs.pearson_corr_by_group(df, "x", "y", "lang").collect()
    assert abs(r["r"] - 1.0) < 1e-12   # int64 wrap would null/garble it
    assert int(r["sum_x"]) == sum(x for _, x, _ in rows)


def test_split_leakage_key_override_collapses_same_origin_pairs(spark):
    fr = {"train": 0.5, "test": 0.5}
    # pairs whose two sides share an origin (id % 100): with the origin
    # as split key no pair can leak; with the raw id some must
    pairs = [(i, i + 100) for i in range(60)]
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    by_id = cs.split_leakage_stats(df, fractions=fr).collect()
    assert sum(r["n_pairs"] for r in by_id if r["leaked"]) > 0
    by_origin = cs.split_leakage_stats(
        df, fractions=fr,
        key_a=F.col("id_a") % 100, key_b=F.col("id_b") % 100).collect()
    assert sum(r["n_pairs"] for r in by_origin if r["leaked"]) == 0
