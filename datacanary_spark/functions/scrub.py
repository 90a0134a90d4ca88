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


def scrub_text(text: str | None) -> tuple[str | None, int]:
    """Scrub one document; returns (scrubbed, total replacement count)."""
    if text is None:
        return None, 0
    total = 0
    for _, pat, repl in SCRUB_PATTERNS:
        text, n = pat.subn(repl, text)
        total += n
    return text, total


def scrub_series(texts: pd.Series) -> tuple[pd.Series, np.ndarray]:
    """Vectorized-ish batch scrub: returns (scrubbed, counts)."""
    out = np.empty(len(texts), dtype=object)
    counts = np.zeros(len(texts), dtype=np.int64)
    vals = texts.to_numpy(dtype=object)
    for i, t in enumerate(vals):
        out[i], counts[i] = scrub_text(t)
    return pd.Series(out, index=texts.index), counts
