"""Model calibration tests (referenced by FilterConfig's threshold
comments): the deterministic langid + perplexity models must separate
clean fixture prose from gibberish with wide margins around the
configured thresholds, and scoring must be batching-invariant."""

from __future__ import annotations

import numpy as np

from datacanary_spark.functions.heuristics import FilterConfig
from datacanary_spark.functions.models import (
    SCORE_MAX_BYTES,
    QualityModels,
    build_default_models,
    make_training_texts,
)
from datacanary_spark.sources.fixtures import LANGS, _gibberish_words, _insert_lines, _sample_words


def _held_out(n_per_lang=40, seed=123456):
    texts, labels = [], []
    for li, lang in enumerate(LANGS):
        for i in range(n_per_lang):
            rng = np.random.default_rng((seed, li, i))
            texts.append(_insert_lines(rng, _sample_words(rng, lang, 150)))
            labels.append(lang)
    return texts, labels


def test_langid_heldout_accuracy_and_confidence():
    m = build_default_models()
    texts, labels = _held_out()
    cfg = FilterConfig()
    pred, conf = m.langid.predict(texts)
    acc = float(np.mean(pred == np.array(labels, dtype=object)))
    assert acc >= 0.99
    assert float(np.median(conf)) >= cfg.min_lang_conf


def test_perplexity_separates_clean_from_gibberish():
    m = build_default_models()
    cfg = FilterConfig()
    clean, _ = _held_out(n_per_lang=20)
    gib = [" ".join(_gibberish_words(np.random.default_rng((9, i)), 150))
           for i in range(60)]
    p_clean = m.perplexity.score(clean)
    p_gib = m.perplexity.score(gib)
    assert float(np.percentile(p_clean, 95)) < cfg.max_ppl
    assert float(np.percentile(p_gib, 5)) > cfg.max_ppl


def test_scoring_is_batching_invariant():
    m = build_default_models()
    texts, _ = _held_out(n_per_lang=8)
    whole = m.perplexity.score(texts)
    parts = np.concatenate([m.perplexity.score(texts[:7]),
                            m.perplexity.score(texts[7:])])
    assert np.array_equal(whole, parts)
    lw, cw = m.langid.predict(texts)
    lp1, cp1 = m.langid.predict(texts[:7])
    lp2, cp2 = m.langid.predict(texts[7:])
    assert list(lw) == list(lp1) + list(lp2)
    assert np.array_equal(cw, np.concatenate([cp1, cp2]))


def test_serialization_roundtrip_and_score_cap():
    m = build_default_models()
    blob = m.to_bytes()
    m2 = QualityModels.from_bytes(blob)
    texts, _ = _held_out(n_per_lang=3)
    assert np.array_equal(m.perplexity.score(texts), m2.perplexity.score(texts))
    # scoring window: a doc and the same doc with junk beyond the cap
    # score identically (per-doc cost is bounded at 10^12-doc scale)
    base = texts[0] + "x" * (SCORE_MAX_BYTES + 1000)
    extended = base + " completely different trailing content 123"
    assert m.perplexity.score([base])[0] == m.perplexity.score([extended])[0]
    assert m.langid.predict([base])[0][0] == m.langid.predict([extended])[0][0]


def test_training_corpus_deterministic():
    t1, l1 = make_training_texts(n_per_lang=5)
    t2, l2 = make_training_texts(n_per_lang=5)
    assert t1 == t2 and l1 == l2
