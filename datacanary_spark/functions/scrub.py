"""PII / toxicity scrubbing with compiled Python regexes.

Byte-identity contract: scrubbed text must be byte-identical per url
between the Spark pipeline and the golden reference labels. Regexes
therefore run in Python's ``re`` engine on BOTH sides (never Java
``regexp_replace`` — different dialect/unicode semantics, SURVEY.md §4.2)
and are applied in the fixed order below, each as a global left-to-right
non-overlapping ``re.subn`` — fully deterministic.

The email/phone regex shapes mirror the reference's own example rule
config (/root/reference/src/examples/advanced_rules.yaml:15-23 —
anchored versions used there for PatternMatchRule; unanchored here for
in-text scrubbing).

Executed inside an Arrow-batched pandas UDF (see udfs.py) — this is the
pipeline's only per-row Python work; it's bounded by the rows that
survive the heuristic filter when ``scrub_after_filter`` ordering is on.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from datacanary_spark.sources.fixtures import TOXIC_LEXICON

SCRUB_PATTERNS: list[tuple[str, re.Pattern, str]] = [
    ("email", re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"), "<EMAIL>"),
    ("phone", re.compile(r"\b\d{3}-\d{3}-\d{4}\b"), "<PHONE>"),
    ("ssn", re.compile(r"\b\d{3}-\d{2}-\d{4}\b"), "<SSN>"),
    ("ip", re.compile(r"\b(?:\d{1,3}\.){3}\d{1,3}\b"), "<IP>"),
    ("toxicity",
     re.compile(r"\b(?:" + "|".join(re.escape(w) for w in TOXIC_LEXICON) + r")\b",
                re.IGNORECASE),
     "<TOX>"),
]


# Payment-card candidates: 13-19 digits, optionally space/dash grouped.
# A digit-shape match alone over-redacts (order numbers, timestamps);
# the Luhn checksum below gates the actual rewrite, which is why card
# scrubbing is the one pattern with a VALIDATED (callable) replacement
# and ships opt-in via card_scrub_entry() rather than in the default
# list (default output bytes stay frozen for the golden contract).
CARD_CANDIDATE = re.compile(r"\b(?:\d[ -]?){12,18}\d\b")


def luhn_valid(digits: str) -> bool:
    """Luhn mod-10 checksum over a digit string (ISO/IEC 7812): from
    the RIGHT, double every second digit, subtract 9 when that
    overflows a digit, sum, valid iff sum % 10 == 0."""
    total = 0
    for i, ch in enumerate(reversed(digits)):
        d = ord(ch) - 48
        if i % 2 == 1:
            d = d * 2 - 9 if d >= 5 else d * 2
        total += d
    return total % 10 == 0


def card_scrub_entry(repl: str = "<CARD>"):
    """Opt-in scrub pattern entry for payment cards: candidate by
    digit shape, rewritten only when the ungrouped digits pass Luhn
    and have card-plausible length. Append to a patterns list passed
    to scrub_text/scrub_series."""
    def _sub(m: re.Match) -> str:
        digits = re.sub(r"[ -]", "", m.group(0))
        if 13 <= len(digits) <= 19 and luhn_valid(digits):
            return repl
        return m.group(0)

    return ("card", CARD_CANDIDATE, _sub)


def scrub_text(text: str | None, patterns=None) -> tuple[str | None, int]:
    """Scrub one document; returns (scrubbed, total replacement count).

    ``patterns`` defaults to SCRUB_PATTERNS; entries are (name,
    compiled_pattern, repl) where repl is a string or a callable
    (re.sub replacement function). Callable repls count only matches
    they actually CHANGED — a validator that returns the match
    untouched (e.g. a Luhn-failing card candidate) is not a scrub."""
    if text is None:
        return None, 0
    total = 0
    for _, pat, repl in (SCRUB_PATTERNS if patterns is None else patterns):
        if callable(repl):
            changed = 0

            def _counting(m, _repl=repl):
                nonlocal changed
                out = _repl(m)
                if out != m.group(0):
                    changed += 1
                return out

            text = pat.sub(_counting, text)
            total += changed
        else:
            text, n = pat.subn(repl, text)
            total += n
    return text, total


def scrub_series(texts: pd.Series, patterns=None) \
        -> tuple[pd.Series, np.ndarray]:
    """Vectorized-ish batch scrub: returns (scrubbed, counts)."""
    out = np.empty(len(texts), dtype=object)
    counts = np.zeros(len(texts), dtype=np.int64)
    vals = texts.to_numpy(dtype=object)
    for i, t in enumerate(vals):
        out[i], counts[i] = scrub_text(t, patterns)
    return pd.Series(out, index=texts.index), counts
