"""Property-based tests for line/paragraph corpus dedup: a pure-Python
first-occurrence-survival twin checked against the Spark operator over
random corpora, plus idempotence and round-trip laws."""

from __future__ import annotations

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st

# words + newlines so random texts form real lines AND paragraphs
_TEXT = st.text(alphabet=st.sampled_from(list("ab c.\n")), max_size=60)
_CORPUS = st.lists(_TEXT, min_size=1, max_size=6)


def golden_dedup_lines(texts, sep="\n", min_chars=1):
    """First-occurrence survival, the operator's stated law: every
    distinct fragment (>= min_chars) survives only at its minimum
    (doc, position); short fragments are exempt; docs reassemble in
    position order with ``sep``."""
    firsts = {}
    for i, t in enumerate(texts):
        if t is None:
            continue
        for p, frag in enumerate(t.split(sep)):
            if len(frag) >= min_chars:
                k = hashlib.md5(frag.encode()).hexdigest()
                if k not in firsts or (i, p) < firsts[k]:
                    firsts[k] = (i, p)
    out = {}
    for i, t in enumerate(texts):
        if t is None:
            out[i] = None
            continue
        kept = [frag for p, frag in enumerate(t.split(sep))
                if len(frag) < min_chars
                or firsts[hashlib.md5(frag.encode()).hexdigest()] == (i, p)]
        out[i] = sep.join(kept)
    return out


@given(_CORPUS, st.sampled_from(["\n", "\n\n"]))
def test_golden_twin_roundtrip_on_unique_corpus(texts, sep):
    """With all fragments globally unique (forced by doc-id salting),
    dedup is the identity — split-then-join must round-trip."""
    salted = [t.replace(" ", f" u{i}x ") if t else t
              for i, t in enumerate(texts)]
    # salting can still collide for empty/short fragments; the law
    # tested is: every doc's output is a subsequence join of its input
    out = golden_dedup_lines(salted, sep=sep)
    for i, t in enumerate(salted):
        frags = t.split(sep)
        # "" is the join of ZERO kept fragments (everything deduped
        # away) — distinct from a kept empty fragment; vacuous here
        out_frags = out[i].split(sep) if out[i] else []
        it = iter(frags)
        assert all(any(f == o for f in it) for o in out_frags), (t, out[i])


@given(_CORPUS, st.sampled_from(["\n", "\n\n"]))
def test_golden_twin_idempotent(texts, sep):
    once = golden_dedup_lines(texts, sep=sep)
    twice = golden_dedup_lines([once[i] for i in sorted(once)], sep=sep)
    assert twice == once


@settings(max_examples=10, deadline=None)
@given(_CORPUS, st.sampled_from(["\n", "\n\n"]))
def test_spark_dedup_lines_matches_golden_twin(spark, texts, sep):
    from datacanary_spark.operators import dedup as dd

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id: long, text: string")
    got = {r["doc_id"]: r["text"]
           for r in dd.dedup_lines(df, sep=sep, persist=False).collect()}
    want = golden_dedup_lines(texts, sep=sep)
    assert got == want, (texts, sep)
