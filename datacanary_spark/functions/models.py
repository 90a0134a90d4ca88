"""Broadcastable text-quality models: hashed-n-gram language-ID and
KenLM-style character-n-gram perplexity.

Design constraints (from the build contract):

* **Vectorized** — scoring is pure numpy over Arrow-batched pandas
  Series; no per-row Python. The core trick: concatenate each batch's
  utf-8 bytes into one buffer, compute rolling polynomial hashes for all
  n-grams in a handful of numpy ops, then segment-reduce per document
  with ``np.add.reduceat`` (batch-size independent: each document's
  score depends only on its own bytes, so Spark's Arrow batching cannot
  change any verdict).
* **Deterministic & self-contained** — models train in-repo on the
  seeded fixture corpus (no downloads); training and scoring share the
  same hash function, so results are reproducible bit-for-bit anywhere.
* **Broadcast once per executor** — models serialize to a compact bytes
  blob (< a few MB) for ``SparkContext.broadcast``; deserialization is
  cached per process (see functions/udfs.py).

The reference has no models at all (its PatternMatchRule is the closest
thing — /root/reference/src/datacanary/rules/rule_engine.py:237-316);
these generalize its per-column checks into the per-document scoring the
north rule requires.
"""

from __future__ import annotations

import pickle
from dataclasses import dataclass
from functools import lru_cache

import numpy as np

_PRIME = np.uint64(1099511628211)  # FNV-64 prime; uint64 wraps mod 2^64


# Scoring window: langid/perplexity read at most this many utf-8 bytes
# per document (CLD2-style sampling — a page's language/fluency is
# determined in its first KBs). Bounds per-doc model cost at 10^12-doc
# scale regardless of document length. The golden twin shares this code,
# so labels are identical by construction.
SCORE_MAX_BYTES = 4096


def _encode(texts, max_bytes: int | None = None) -> list[bytes]:
    out = [("" if t is None else str(t)).encode("utf-8") for t in texts]
    if max_bytes is not None:
        out = [b[:max_bytes] for b in out]
    return out


def byte_ngram_hashes(byte_docs: list[bytes], n: int, n_buckets: int):
    """Rolling polynomial hash of every byte n-gram of every doc.

    Returns ``(buckets, offsets)`` where ``buckets[offsets[d]:offsets[d+1]]``
    are doc d's n-gram bucket ids. Docs shorter than n contribute zero
    n-grams. Fully vectorized; O(total_bytes).
    """
    n_docs = len(byte_docs)
    lens = np.fromiter((len(b) for b in byte_docs), dtype=np.int64, count=n_docs)
    counts = np.clip(lens - n + 1, 0, None)
    offsets = np.zeros(n_docs + 1, np.int64)
    np.cumsum(counts, out=offsets[1:])
    blob = b"".join(byte_docs)
    total = len(blob)
    if total < n or offsets[-1] == 0:
        return np.empty(0, np.int64), offsets
    arr = np.frombuffer(blob, np.uint8).astype(np.uint64)
    h = arr[: total - n + 1].copy()
    for k in range(1, n):
        h *= _PRIME
        h += arr[k : total - n + 1 + k]
    # Mask n-grams that straddle a document boundary.
    ends = np.cumsum(lens)
    mask = np.ones(total - n + 1, bool)
    if n_docs > 1:
        bad = (ends[:-1, None] - np.arange(n - 1, 0, -1)[None, :]).ravel()
        bad = bad[(bad >= 0) & (bad < total - n + 1)]
        mask[bad] = False
    valid = h[mask]
    assert valid.shape[0] == offsets[-1], "boundary masking mismatch"
    return (valid % np.uint64(n_buckets)).astype(np.int64), offsets


def segment_sum(values: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Per-document sum of a 1-D ``values`` array given segment ``offsets``.

    Uses ``np.add.reduceat`` over the starts of NON-empty segments only
    (reduceat misbehaves on empty segments); empty docs get zeros. Each
    segment is reduced independently in float64 → results are identical
    under any batching of documents.
    """
    n_seg = len(offsets) - 1
    out = np.zeros(n_seg, dtype=np.float64)
    seg_counts = np.diff(offsets)
    nonempty = seg_counts > 0
    if values.shape[0] and nonempty.any():
        starts = offsets[:-1][nonempty]
        out[nonempty] = np.add.reduceat(values, starts, dtype=np.float64)
    return out


@dataclass
class LangIdModel:
    """fastText-style linear language identifier over hashed char n-grams.

    Multinomial Naive Bayes on hashed byte-trigram counts; confidence is
    the softmax posterior of the winning class computed from
    length-normalized (per-trigram mean) log-likelihoods so long
    documents don't saturate it.
    """

    langs: list[str]
    log_prior: np.ndarray          # (L,)
    log_likelihood: np.ndarray     # (L, n_buckets) float32, C-contiguous:
                                   # each language row is a 128 KB table that
                                   # fits in L2, so scoring is L cheap 1-D
                                   # gathers instead of one huge 2-D gather
    n: int = 3
    n_buckets: int = 1 << 15
    temperature: float = 40.0      # sharpening for the per-trigram posterior

    @classmethod
    def train(cls, texts, labels, langs: list[str] | None = None,
              alpha: float = 0.5, n: int = 3, n_buckets: int = 1 << 15,
              temperature: float = 40.0) -> "LangIdModel":
        langs = langs or sorted(set(labels))
        lang_ix = {l: i for i, l in enumerate(langs)}
        y = np.fromiter((lang_ix[l] for l in labels), dtype=np.int64)
        buckets, offsets = byte_ngram_hashes(_encode(texts), n, n_buckets)
        per_gram_lang = np.repeat(y, np.diff(offsets))
        counts = np.zeros((n_buckets, len(langs)), np.float64)
        np.add.at(counts, (buckets, per_gram_lang), 1.0)
        ll = np.log(counts + alpha) - np.log(counts.sum(axis=0) + alpha * n_buckets)
        prior = np.log(np.bincount(y, minlength=len(langs)) / len(y))
        return cls(langs=list(langs), log_prior=prior,
                   log_likelihood=np.ascontiguousarray(ll.T.astype(np.float32)),
                   n=n, n_buckets=n_buckets, temperature=temperature)

    def predict(self, texts):
        """Returns (lang: np.ndarray[str], conf: np.ndarray[float64])."""
        buckets, offsets = byte_ngram_hashes(
            _encode(texts, SCORE_MAX_BYTES), self.n, self.n_buckets)
        n_docs = len(offsets) - 1
        n_langs = len(self.langs)
        doc_ll = np.zeros((n_docs, n_langs), dtype=np.float64)
        for l in range(n_langs):
            doc_ll[:, l] = segment_sum(self.log_likelihood[l][buckets], offsets)
        counts = np.diff(offsets).astype(np.float64)
        denom = np.maximum(counts, 1.0)[:, None]
        mean_ll = doc_ll / denom                        # per-trigram mean
        logits = mean_ll * self.temperature
        logits = logits - logits.max(axis=1, keepdims=True)
        post = np.exp(logits)
        post /= post.sum(axis=1, keepdims=True)
        best = post.argmax(axis=1)
        conf = post[np.arange(len(best)), best]
        # Docs with zero trigrams: fall back to prior argmax, conf 0.
        empty = counts == 0
        if empty.any():
            best = np.where(empty, int(np.argmax(self.log_prior)), best)
            conf = np.where(empty, 0.0, conf)
        langs_arr = np.array(self.langs, dtype=object)
        return langs_arr[best], conf


EMPTY_DOC_PPL = 1e9  # sentinel perplexity for docs too short to score


@dataclass
class PerplexityModel:
    """KenLM-style hashed character 4-gram LM with add-k smoothing.

    p(c | ctx3) ≈ (count4[h(ctx3+c)] + k) / (count3[h(ctx3)] + k*V),
    perplexity = exp(-mean log p). Counts live in two flat uint64
    arrays (hashed, collision-tolerant) — the same "store n-gram stats
    in a big hashed array" idea KenLM's probing model uses.
    """

    count4: np.ndarray  # (n_buckets,) float64 (log-ready)
    count3: np.ndarray
    n_buckets: int = 1 << 18
    k: float = 0.1
    vocab: float = 256.0

    @classmethod
    def train(cls, texts, n_buckets: int = 1 << 18, k: float = 0.1) -> "PerplexityModel":
        docs = _encode(texts)
        c4 = np.zeros(n_buckets, np.float64)
        c3 = np.zeros(n_buckets, np.float64)
        h4, _ = byte_ngram_hashes(docs, 4, n_buckets)
        h3, _ = byte_ngram_hashes(docs, 3, n_buckets)
        np.add.at(c4, h4, 1.0)
        np.add.at(c3, h3, 1.0)
        return cls(count4=c4, count3=c3, n_buckets=n_buckets, k=k)

    def score(self, texts) -> np.ndarray:
        """Per-document perplexity (lower = more language-like), over the
        first SCORE_MAX_BYTES of each document."""
        docs = _encode(texts, SCORE_MAX_BYTES)
        h4, off4 = byte_ngram_hashes(docs, 4, self.n_buckets)
        h3, off3 = byte_ngram_hashes(docs, 3, self.n_buckets)
        counts4 = np.diff(off4)
        if h4.shape[0] == 0:
            return np.full(len(docs), EMPTY_DOC_PPL)
        # Align each 4-gram with its 3-byte context hash: doc d's j-th
        # 4-gram context is doc d's j-th 3-gram.
        pos_within = np.arange(off4[-1]) - np.repeat(off4[:-1], counts4)
        h3_aligned = h3[np.repeat(off3[:-1], counts4) + pos_within]
        logp = (np.log(self.count4[h4] + self.k)
                - np.log(self.count3[h3_aligned] + self.k * self.vocab))
        total = segment_sum(logp, off4)
        denom = np.maximum(counts4, 1).astype(np.float64)
        ppl = np.exp(-total / denom)
        return np.where(counts4 == 0, EMPTY_DOC_PPL, ppl)


@dataclass
class QualityModels:
    """Bundle broadcast to executors."""

    langid: LangIdModel
    perplexity: PerplexityModel

    def to_bytes(self) -> bytes:
        return pickle.dumps(self, protocol=4)

    @staticmethod
    def from_bytes(blob: bytes) -> "QualityModels":
        return pickle.loads(blob)


def make_training_texts(n_per_lang: int = 300, seed: int = 777,
                        min_words: int = 120, max_words: int = 320):
    """Deterministic clean-prose training corpus from the fixture pools."""
    from datacanary_spark.sources.fixtures import LANGS, _insert_lines, _sample_words

    texts, labels = [], []
    for lang_ix, lang in enumerate(LANGS):
        for i in range(n_per_lang):
            # NB: python hash() is process-randomized — use the stable index
            rng = np.random.default_rng((seed, lang_ix, i))
            n_words = int(rng.integers(min_words, max_words))
            texts.append(_insert_lines(rng, _sample_words(rng, lang, n_words)))
            labels.append(lang)
    return texts, labels


@lru_cache(maxsize=1)
def build_default_models() -> QualityModels:
    """The engine's default deterministic models (train ≈ seconds)."""
    texts, labels = make_training_texts()
    return QualityModels(
        langid=LangIdModel.train(texts, labels),
        perplexity=PerplexityModel.train(texts),
    )
