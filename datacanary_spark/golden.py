"""Golden-label twin: a slow, obviously-correct pure-Python/pandas
implementation of the quality-filter pipeline.

This is the "reference pipeline" whose labels the Spark pipeline must
match (keep/drop F1 ≥ 0.99; scrubbed text byte-identical per url —
BASELINE.md). The heuristic statistics and verdict assembly here are
implemented INDEPENDENTLY of the Spark Column expressions (plain Python
loops + ``re``), so any Spark/Java semantic drift (regex dialect, split
behavior, null handling, rounding) shows up as a label mismatch in
tests. The model artifacts (langid/perplexity) and the scrub regex list
ARE shared — they are the specification of the models themselves, and
sharing them is what makes byte-identity achievable at all (SURVEY.md
§7 hard-parts 2-3).

Null-handling convention (mirrors the Spark exprs exactly): a statistic
that cannot be computed is None, and a rule whose needed stat is None
counts as a hit — EXCEPT the two dup-fraction stats, which coalesce to
0.0 (matching ``F.coalesce(1 - try_divide(...), 0.0)``).
"""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd

from datacanary_spark.functions.heuristics import ALL_STOPWORDS, FilterConfig
from datacanary_spark.functions.models import QualityModels, build_default_models
from datacanary_spark.functions.scrub import scrub_text

# The tokenization CONTRACT is Java's \s class [ \t\n\x0B\f\r] (what the
# Spark pipeline's split() uses). Python's \s would additionally split
# on unicode whitespace (\xa0,  , …) and silently diverge — spelled
# out explicitly so the twin matches on ALL inputs, not just fixtures.
_WS = re.compile(r"[ \t\n\x0B\f\r]+")
_SYM = re.compile(r"[#$%&*+=~^|]")


def _doc_stats(text: str | None) -> dict[str, float | None]:
    if text is None:
        return {k: None for k in ("word_count", "mean_word_length",
                                  "symbol_to_word_ratio", "stopword_fraction",
                                  "bullet_line_fraction", "ellipsis_line_fraction")} | {
            "dup_line_fraction": 0.0, "dup_trigram_fraction": 0.0}
    words = [w for w in _WS.split(text) if w]
    wc = len(words)
    lines = text.split("\n")
    lc = len(lines)
    mwl = (sum(len(w) for w in words) / wc) if wc else None
    symbols = len(_SYM.findall(text))
    sym_ratio = (symbols / wc) if wc else None
    stop_frac = (sum(1 for w in words if w in ALL_STOPWORDS) / wc) if wc else None
    dup_line = (1.0 - len(set(lines)) / lc) if lc else 0.0
    if wc >= 3:
        tris = [" ".join(words[i:i + 3]) for i in range(wc - 2)]
        dup_tri = 1.0 - len(set(tris)) / len(tris)
    else:
        dup_tri = 0.0
    bullet = (sum(1 for l in lines
                  if l.startswith("- ") or l.startswith("• ") or l.startswith("* "))
              / lc) if lc else None
    ellipsis = (sum(1 for l in lines if l.endswith("...")) / lc) if lc else None
    return {
        "word_count": wc, "mean_word_length": mwl,
        "symbol_to_word_ratio": sym_ratio, "stopword_fraction": stop_frac,
        "dup_line_fraction": dup_line, "dup_trigram_fraction": dup_tri,
        "bullet_line_fraction": bullet, "ellipsis_line_fraction": ellipsis,
    }


def _hit(violated: bool | None) -> int:
    """None (unevaluable) counts as a violation — per-rule containment."""
    return 1 if (violated is None or violated) else 0


def _cmp(a, op, b) -> bool | None:
    if a is None or (isinstance(a, float) and math.isnan(a)):
        return None
    return op(a, b)


def _heuristic_hits(stats: dict, cfg: FilterConfig) -> dict[str, int]:
    import operator as _op

    s = stats
    return {
        "too_few_words": _hit(_cmp(s["word_count"], _op.lt, cfg.min_words)),
        "too_many_words": _hit(_cmp(s["word_count"], _op.gt, cfg.max_words)),
        "mean_word_length": _hit(
            None if s["mean_word_length"] is None else
            (s["mean_word_length"] < cfg.min_mean_word_length
             or s["mean_word_length"] > cfg.max_mean_word_length)),
        "symbol_ratio": _hit(_cmp(s["symbol_to_word_ratio"], _op.gt,
                                  cfg.max_symbol_to_word_ratio)),
        "stopword_fraction": _hit(_cmp(s["stopword_fraction"], _op.lt,
                                       cfg.min_stopword_fraction)),
        "dup_lines": _hit(_cmp(s["dup_line_fraction"], _op.gt,
                               cfg.max_dup_line_fraction)),
        "dup_trigrams": _hit(_cmp(s["dup_trigram_fraction"], _op.gt,
                                  cfg.max_dup_trigram_fraction)),
        "bullet_lines": _hit(_cmp(s["bullet_line_fraction"], _op.gt,
                                  cfg.max_bullet_line_fraction)),
        "ellipsis_lines": _hit(_cmp(s["ellipsis_line_fraction"], _op.gt,
                                    cfg.max_ellipsis_line_fraction)),
    }


def golden_labels(pages: pd.DataFrame, cfg: FilterConfig | None = None,
                  models: QualityModels | None = None) -> pd.DataFrame:
    """Label every page: url, keep, rule_hits, lang_pred, lang_conf, ppl,
    scrubbed_text, scrub_count."""
    cfg = cfg or FilterConfig()
    models = models or build_default_models()

    texts = pages["text"]
    lang_pred, lang_conf = models.langid.predict(texts)
    ppl = models.perplexity.score(texts)

    rows = []
    for i, text in enumerate(texts):
        stats = _doc_stats(None if pd.isna(text) else text)
        hits = _heuristic_hits(stats, cfg)
        hits["perplexity"] = _hit(bool(ppl[i] > cfg.max_ppl))
        hits["langid"] = _hit(not (lang_pred[i] in cfg.allowed_langs
                                   and lang_conf[i] >= cfg.min_lang_conf))
        scrubbed, n_scrub = scrub_text(None if pd.isna(text) else text)
        rows.append({
            "url": pages["url"].iloc[i],
            "keep": sum(hits.values()) == 0,
            "rule_hits": hits,
            "lang_pred": lang_pred[i],
            "lang_conf": lang_conf[i],
            "ppl": float(ppl[i]),
            "scrubbed_text": scrubbed,
            "scrub_count": int(n_scrub),
        })
    return pd.DataFrame(rows)


def f1_score(pred: pd.Series, truth: pd.Series) -> float:
    """Binary F1 of keep decisions (positive class = keep)."""
    tp = int(((pred) & (truth)).sum())
    fp = int(((pred) & (~truth)).sum())
    fn = int(((~pred) & (truth)).sum())
    if tp == 0:
        return 0.0
    prec = tp / (tp + fp)
    rec = tp / (tp + fn)
    return 2 * prec * rec / (prec + rec)
