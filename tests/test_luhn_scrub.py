"""Payment-card PII: Luhn checksum (Python + Column twins) and the
opt-in validated card scrub pattern (functions/scrub.card_scrub_entry)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datacanary_spark.functions.scrub import (
    SCRUB_PATTERNS,
    card_scrub_entry,
    luhn_valid,
    scrub_series,
    scrub_text,
)
from datacanary_spark.operators.text_analysis import luhn_valid_expr

VALID = ["4111111111111111", "4532015112830366", "5500005555555559",
         "378282246310005",            # 15-digit Amex
         "4222222222222"]              # 13-digit Visa
INVALID = ["4111111111111112", "1234567812345678", "4532015112830367"]


def test_luhn_valid_python():
    assert all(luhn_valid(v) for v in VALID)
    assert not any(luhn_valid(v) for v in INVALID)


def test_card_scrub_entry_validated_rewrite():
    pats = list(SCRUB_PATTERNS) + [card_scrub_entry()]
    # valid card (grouped and bare) scrubbed; Luhn-failing twin kept
    t = ("pay 4111 1111 1111 1111 or 4532015112830366, "
         "order 4111111111111112 ships")
    out, n = scrub_text(t, pats)
    assert out == "pay <CARD> or <CARD>, order 4111111111111112 ships"
    assert n == 2
    # default patterns are untouched: no card scrubbing without opt-in
    out_d, n_d = scrub_text(t)
    assert "4532015112830366" in out_d and n_d == 0
    # counts exclude examined-but-kept candidates (the callable-repl law)
    out2, n2 = scrub_text("order 1234567812345678 only", pats)
    assert n2 == 0 and "1234567812345678" in out2


def test_card_scrub_series_matches_text():
    import pandas as pd

    pats = list(SCRUB_PATTERNS) + [card_scrub_entry()]
    texts = pd.Series(["a 4111111111111111 b", "clean", None,
                       "x 1234567812345678 y"])
    scrubbed, counts = scrub_series(texts, pats)
    assert list(counts) == [1, 0, 0, 0]
    assert scrubbed[0] == "a <CARD> b"
    assert scrubbed[2] is None


def test_luhn_expr_matches_python(spark):
    """The Column fold and the Python validator are the same law —
    checked over planted valid/invalid cards, wrong lengths, junk."""
    cases = VALID + INVALID + [
        "41111111111",          # 11 digits: too short
        "41111111111111111111",  # 20 digits: too long
        "4111a11111111111",     # non-digit
        "", None,
    ]
    df = spark.createDataFrame([(c,) for c in cases], "d string")
    got = {r.d: r.ok for r in
           df.select("d", luhn_valid_expr(F.col("d")).alias("ok")).collect()}
    for c in cases:
        expect = (c is not None and c.isdigit() and 13 <= len(c) <= 19
                  and luhn_valid(c))
        assert got.get(c) is expect or got.get(c) == expect, c


def test_luhn_expr_plan_stays_whole_stage(spark):
    df = spark.range(100).select(
        luhn_valid_expr(F.concat(F.lit("4"),
                                 F.lpad(F.col("id").cast("string"), 14, "0"),
                                 F.lit("3"))).alias("ok"))
    s = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in s and "Python" not in s
