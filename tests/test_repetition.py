"""Gopher char-weighted repetition signals (functions/repetition.py):
hand-computed values, null/short-doc edges, a pure-Python brute-force
twin on random docs, the opt-in rule family, and the no-shuffle plan."""

from __future__ import annotations

import random
from collections import Counter

import pytest
from pyspark.sql import functions as F

from datacanary_spark.functions.repetition import (
    DUP_NS,
    TOP_NS,
    RepetitionConfig,
    gopher_repetition_hit_exprs,
    ngrams_expr,
    with_repetition_stats,
    words_expr,
)


def _py_fracs(text: str | None) -> dict[str, float]:
    """Brute-force Counter twin of the run-length fold."""
    out: dict[str, float] = {}
    words = [w for w in (text or "").split()] if text else []
    n_chars = len(text) if text else 0
    for kind, ns in (("top", TOP_NS), ("dup", DUP_NS)):
        for n in ns:
            grams = [" ".join(words[i:i + n])
                     for i in range(len(words) - n + 1)] if len(words) >= n \
                else []
            counts = Counter(grams)
            if kind == "top":
                best = min((g for g, c in counts.items()
                            if c == max(counts.values())), default="") \
                    if counts else ""
                c = counts.get(best, 0)
                numer = c * len(best) if c >= 2 else 0
            else:
                numer = sum((c - 1) * len(g)
                            for g, c in counts.items() if c > 1)
            frac = min(1.0, numer / n_chars) if n_chars else 0.0
            out[f"rep_{kind}_{n}gram_char_fraction"] = frac
    return out


def test_hand_computed_values(spark):
    df = spark.createDataFrame(
        [(1, "a b a b a b a b"),
         (2, "the cat sat on the mat and the cat sat on the rug")],
        "id int, text string")
    rows = {r["id"]: r for r in with_repetition_stats(df).collect()}
    # doc1: 2-grams sorted -> "a b" x4 (len 3); 4*3/15 = 0.8
    assert rows[1]["rep_top_2gram_char_fraction"] == pytest.approx(0.8)
    # doc2: "the cat sat on the" occurs twice (len 18); (2-1)*18/49
    assert rows[2]["rep_dup_5gram_char_fraction"] == pytest.approx(18 / 49)
    assert rows[2]["rep_dup_10gram_char_fraction"] == 0.0


def test_null_empty_short_docs_are_zero(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "one"), (4, "   \n  ")],
        "id int, text string")
    for r in with_repetition_stats(df).collect():
        for n in TOP_NS:
            assert r[f"rep_top_{n}gram_char_fraction"] == 0.0, r
        for n in DUP_NS:
            assert r[f"rep_dup_{n}gram_char_fraction"] == 0.0, r


def test_unique_top_gram_not_counted(spark):
    # every 2-gram distinct -> no repetition signal even though the top
    # gram trivially covers some characters
    df = spark.createDataFrame([(1, "alpha beta gamma delta")],
                               "id int, text string")
    r = with_repetition_stats(df).first()
    assert r["rep_top_2gram_char_fraction"] == 0.0


def test_fold_matches_python_counter_twin(spark):
    rng = random.Random(41)
    vocab = [f"w{i}" for i in range(12)]
    docs = []
    for i in range(40):
        n = rng.randrange(0, 60)
        words = [rng.choice(vocab) for _ in range(n)]
        if n > 10 and rng.random() < 0.5:  # plant a repeated span
            span = words[:6]
            words = words + span * rng.randrange(1, 4)
        docs.append((i, " ".join(words)))
    df = spark.createDataFrame(docs, "id int, text string")
    got = {r["id"]: r.asDict() for r in with_repetition_stats(df).collect()}
    for i, text in docs:
        want = _py_fracs(text)
        for k, v in want.items():
            assert got[i][k] == pytest.approx(v, abs=1e-12), (i, k, text)


def test_cap_at_one_for_overlapping_grams(spark):
    # "a a a ... a": overlapping dup 5-grams double-count chars; the
    # fraction must cap at 1.0
    df = spark.createDataFrame([(1, " ".join(["a"] * 30))],
                               "id int, text string")
    r = with_repetition_stats(df).first()
    assert r["rep_dup_5gram_char_fraction"] == 1.0
    assert r["rep_top_2gram_char_fraction"] == 1.0


def test_hit_exprs_polarity_and_nulls(spark):
    cfg = RepetitionConfig()
    df = with_repetition_stats(spark.createDataFrame(
        [(1, " ".join(["spam ham"] * 20)),      # extreme repetition
         (2, " ".join(f"u{i}" for i in range(40)))],  # all unique
        "id int, text string"))
    out = df.withColumns(gopher_repetition_hit_exprs(cfg))
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["top_2gram_chars"] == 1
    assert rows[1]["dup_5gram_chars"] == 1
    for name in cfg.rule_names():
        assert rows[2][name] == 0, name


def test_ngrams_expr_validates_n():
    with pytest.raises(ValueError):
        ngrams_expr(F.col("w"), 0)


def test_plan_is_narrow_no_shuffle(spark):
    df = spark.createDataFrame([(1, "a b c")], "id int, text string")
    plan = with_repetition_stats(df)._jdf.queryExecution().executedPlan() \
        .toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_words_contract_shared_with_heuristics(spark):
    # repetition reuses the exact words_expr tokenization contract
    df = spark.createDataFrame([(1, "  a\t b \n c  ")], "id int, text string")
    r = df.select(words_expr(F.col("text")).alias("w")).first()
    assert r["w"] == ["a", "b", "c"]


def test_short_threshold_tuple_raises_not_truncates():
    """A RepetitionConfig threshold tuple shorter than the rule list
    must fail loudly — pre-fix, zip() silently dropped the uncovered
    dup-6..10 rules while rule_names() still advertised them."""
    import pytest

    from datacanary_spark.functions.repetition import (
        RepetitionConfig,
        gopher_repetition_hit_exprs,
    )

    with pytest.raises(ValueError):
        gopher_repetition_hit_exprs(
            RepetitionConfig(max_dup_ngram_char_fraction=(0.15,)))
    with pytest.raises(ValueError):
        gopher_repetition_hit_exprs(
            RepetitionConfig(max_top_ngram_char_fraction=(0.2, 0.18)))
