"""LSH parameter selection (functions/lsh_tuning.py): S-curve math,
band choice vs brute-force objective, integration with the dedup
operators' parameters."""

from __future__ import annotations

import math

import pytest

from datacanary_spark.functions import lsh_tuning as lt


def test_match_probability_endpoints_and_monotone():
    assert lt.lsh_match_probability(0.0, 4, 4) == 0.0
    assert lt.lsh_match_probability(1.0, 4, 4) == 1.0
    ps = [lt.lsh_match_probability(s / 20, 4, 4) for s in range(21)]
    assert all(a <= b for a, b in zip(ps, ps[1:]))
    # closed form at one point: s=0.5, b=4, r=4
    assert math.isclose(lt.lsh_match_probability(0.5, 4, 4),
                        1 - (1 - 0.5 ** 4) ** 4)
    with pytest.raises(ValueError):
        lt.lsh_match_probability(1.5, 4, 4)


def test_threshold_inflection():
    # (1/4)^(1/4) ~ 0.707: the repo's default 16-hash/4-band geometry
    # targets ~0.7 Jaccard — matches near_dup_pairs' default threshold
    assert math.isclose(lt.lsh_threshold(4, 4), 0.25 ** 0.25)
    # more bands at fixed rows → lower threshold (catches fuzzier pairs)
    assert lt.lsh_threshold(8, 2) < lt.lsh_threshold(2, 2)
    # P at the inflection is in the steep middle of the curve
    for b, r in ((4, 4), (8, 16), (20, 5)):
        p = lt.lsh_match_probability(lt.lsh_threshold(b, r), b, r)
        assert 0.4 < p < 0.75, (b, r, p)


def test_choose_bands_is_argmin_of_objective():
    for n, t in ((16, 0.7), (16, 0.3), (128, 0.8), (64, 0.5)):
        got = lt.choose_bands(n, t)
        assert got[0] * got[1] == n
        costs = {}
        for b in range(1, n + 1):
            if n % b == 0:
                fp, fn = lt.false_rates(t, b, n // b)
                costs[(b, n // b)] = 0.5 * fp + 0.5 * fn
        assert costs[got] == min(costs.values())


def test_choose_bands_weights_shift_choice():
    # punishing false negatives hard → more bands (lower threshold,
    # catch everything); punishing false positives → fewer bands
    fn_heavy = lt.choose_bands(64, 0.6, fp_weight=0.05, fn_weight=0.95)
    fp_heavy = lt.choose_bands(64, 0.6, fp_weight=0.95, fn_weight=0.05)
    assert fn_heavy[0] > fp_heavy[0]
    with pytest.raises(ValueError):
        lt.choose_bands(1, 0.5)
    with pytest.raises(ValueError):
        lt.choose_bands(16, 1.0)


def test_false_rates_tighten_with_more_hashes():
    # a bigger signature at the same target threshold should never make
    # BOTH error areas worse — the whole point of paying for more hashes
    b16 = lt.choose_bands(16, 0.7)
    b256 = lt.choose_bands(256, 0.7)
    fp16, fn16 = lt.false_rates(0.7, *b16)
    fp256, fn256 = lt.false_rates(0.7, *b256)
    assert fp256 + fn256 < fp16 + fn16


def test_near_dup_pairs_auto_bands(spark):
    from pyspark.sql import functions as F

    from datacanary_spark.operators import dedup as dd

    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [(1, base), (2, base + " x"), (3, "completely different content "
                                          "about spark physical plans")],
        "doc_id long, text string")
    # auto at the default threshold resolves to the default 4x4 geometry
    auto = dd.near_dup_pairs(docs, threshold=0.7, bands="auto",
                             persist=False)
    fixed = dd.near_dup_pairs(docs, threshold=0.7, bands=4, persist=False)
    assert sorted(map(tuple, auto.collect())) \
        == sorted(map(tuple, fixed.collect()))
    pair = auto.where((F.col("id_a") == 1) & (F.col("id_b") == 2))
    assert pair.count() == 1
