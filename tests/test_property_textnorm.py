"""Property-based tests (hypothesis) for the r04j pure-Python
primitives — split thresholds, chunk arithmetic, mojibake repair,
normalization. No SparkSession: every property checks the Python twin
of an expression contract, so hundreds of examples run in seconds.
"""

from __future__ import annotations

import hashlib
import math
import unicodedata

from hypothesis import given, settings
from hypothesis import strategies as st

from datacanary_spark.functions import normalize as nz
from datacanary_spark.operators import corpus_stats as cs


# --- split thresholds ------------------------------------------------------

@given(st.floats(min_value=0.0, max_value=1.0, allow_nan=False))
def test_hex_threshold_monotone_and_bounded(f):
    t = cs._hex_threshold(f)
    assert t == "g" or (len(t) == 8 and int(t, 16) <= 16 ** 8)
    # monotone: a larger fraction never yields a smaller threshold
    smaller = cs._hex_threshold(f / 2)
    assert smaller <= t or t == "g"


@given(st.lists(st.floats(min_value=0.01, max_value=1.0,
                          allow_nan=False), min_size=2, max_size=6),
       st.integers(min_value=0, max_value=10_000))
def test_split_rule_total_and_exclusive(weights, key):
    """The Python twin of split_expr's CASE assigns every key to
    EXACTLY one split, and cumulative thresholds are non-decreasing."""
    total = sum(weights)
    fractions = {f"s{i}": w / total for i, w in enumerate(weights)}
    # renormalization drift: force exact sum like callers must
    names = list(fractions)
    fractions[names[-1]] += 1.0 - sum(fractions.values())
    thresholds = cs._split_thresholds(fractions)
    assert [t for _, t in thresholds] == sorted(t for _, t in thresholds)
    b = hashlib.md5(f"split:{key}".encode()).hexdigest()[:8]
    assigned = next((n for n, t in thresholds if b < t), names[-1])
    assert assigned in fractions


# --- chunk arithmetic ------------------------------------------------------

@given(st.integers(min_value=0, max_value=5000),
       st.integers(min_value=1, max_value=400),
       st.integers(min_value=1, max_value=400))
def test_chunk_count_formula_covers_text(n, chunk, stride):
    """n_chunks = max(1, ceil((n-chunk)/stride)+1) covers every char
    exactly when stride <= chunk (the operator's validated domain) and
    never emits a chunk starting past the end for non-empty text."""
    if stride > chunk:
        return  # rejected by the operator
    n_chunks = max(1, math.ceil((n - chunk) / stride) + 1)
    covered = set()
    for i in range(n_chunks):
        start = i * stride
        covered.update(range(start, min(start + chunk, n)))
    assert covered == set(range(n))
    if n > 0:
        assert (n_chunks - 1) * stride < n


# --- mojibake repair -------------------------------------------------------

@given(st.text(alphabet=st.characters(max_codepoint=0x7F), max_size=80))
def test_repair_never_touches_ascii(s):
    assert nz._fix_one(s) == s


@given(st.text(min_size=1, max_size=60))
def test_repair_is_involution_safe(s):
    """Repairing the MOJIBAKE of any text recovers the text, and
    repairing is single-pass stable on its own output unless the
    output is itself a valid mojibake encoding (nested double-encoding
    is out of the single-pass contract)."""
    for enc in ("cp1252", "latin-1"):
        try:
            broken = s.encode("utf-8").decode(enc)
        except UnicodeDecodeError:
            continue
        assert nz._fix_one(broken) == s
        break


@given(st.text(max_size=60))
def test_nfc_idempotent_and_repair_preserves_nfc_roundtrip(s):
    once = unicodedata.normalize("NFC", s)
    assert unicodedata.normalize("NFC", once) == once
