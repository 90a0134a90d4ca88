"""Distributed byte-pair-encoding (BPE) subword learning and tokenization
(Sennrich, Haddow & Birch 2016, "Neural Machine Translation of Rare Words
with Subword Units").

The training-data-pipeline op the rest of the repo's token accounting
feeds into: before a tokenizer exists, token budgets (``token_shard_sizes``,
``seq_packing``) run on whitespace words; this module learns the subword
merge table itself from the corpus, the same way production tokenizers
(GPT-2/SentencePiece-BPE) are trained — so the engine covers the full
loop: curate the corpus, LEARN the tokenizer on it, tokenize with it.

The reference repo (a single-process pandas profiler,
``/root/reference/src/datacanary``) has no tokenizer surface; this module
belongs to the LLM-data-pipeline extension (SURVEY.md §2).

Scale shape (10^12 docs):

* The corpus-sized work is ONE pass: ``word_freqs`` is explode + hash
  aggregation with map-side partial aggregation, so the shuffle volume
  is the corpus VOCABULARY (Heaps' law: ~10^7-10^8 distinct words at
  web scale), not the token stream. Everything downstream of that one
  shuffle operates on the aggregated (word, count) table.
* ``pair_counts`` stays distributed: per-word adjacent symbol pairs
  weighted by word frequency — another vocabulary-sized aggregation.
* ``learn_bpe_merges`` runs the merge loop on a deterministically
  capped head of the vocabulary (``max_vocab`` rows, count-desc/word-asc
  — the standard practice: HuggingFace/SentencePiece train from an
  in-memory word-count dict too, because the frequency mass is
  overwhelmingly in the head). The collect is bounded by ``max_vocab``,
  documented, and independent of corpus size — same driver-side-model
  lifecycle as ``functions/models.py``.
* ``apply_bpe`` is the scale path back out: the learned ranks table
  ships once per executor inside an Arrow-batched pandas UDF (never
  per-row Python), with a per-worker word→tokens memo — web text
  repeats words massively, so the memo turns per-token cost into
  per-distinct-word cost within each batch stream.
"""

from __future__ import annotations

import heapq
import re
from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType
from pyspark.sql.window import Window

from datacanary_spark.functions.heuristics import words_expr

__all__ = ["word_freqs", "pair_counts", "top_pairs_by_group",
           "learn_bpe_merges", "apply_bpe", "bpe_segment_word",
           "word_tokenizer_udf"]


def word_freqs(df: DataFrame, text_col: str = "text",
               group_cols: Sequence[str] = ()) -> DataFrame:
    """Aggregate the corpus to its vocabulary: ``(*group_cols, w, c)``.

    One explode + one hash aggregation; map-side partial aggregation
    collapses each task's repeated words before the exchange, so the
    shuffle ships ~|vocabulary| rows, not ~|tokens| rows. This is the
    ONLY corpus-sized stage of BPE training — every later stage runs
    over this table.
    """
    words = df.where(F.col(text_col).isNotNull()).select(
        *group_cols, F.explode(words_expr(F.col(text_col))).alias("w"))
    return (words.groupBy(*group_cols, "w")
            .agg(F.count(F.lit(1)).alias("c")))


def _char_pairs(w) -> F.Column:
    """Array of adjacent character pairs of ``w`` (code-point level):
    ``substr(w, i, 2)`` for i = 1..len-1. Guarded for len < 2 — Spark's
    ``sequence(1, 0)`` would DESCEND, not return empty. The lambda's
    ``w`` is a bound column ref, so the transform form is safe here
    (see ``heuristics.ngrams_expr``'s O(n²) caveat for unbound trees).
    """
    col = F.col(w)
    n = F.length(col) - 1
    return F.when(
        n >= 1,
        F.transform(F.sequence(F.lit(1), n),
                    lambda i: col.substr(i, F.lit(2)))
    ).otherwise(F.array().cast("array<string>"))


def pair_counts(wf: DataFrame,
                group_cols: Sequence[str] = ()) -> DataFrame:
    """Initial BPE statistics: adjacent character-pair frequencies
    weighted by word frequency, ``(*group_cols, pair, pair_count)``.

    Input is the ``word_freqs`` table, so the explode produces
    ~|vocab|·mean_word_len rows — vocabulary-sized, not corpus-sized;
    the weight column ``c`` carries the corpus mass.
    """
    pairs = wf.select(*group_cols, F.col("c"),
                      F.explode(_char_pairs("w")).alias("pair"))
    return (pairs.groupBy(*group_cols, "pair")
            .agg(F.sum("c").alias("pair_count")))


def top_pairs_by_group(df: DataFrame, text_col: str = "text",
                       group_col: str = "lang", k: int = 5) -> DataFrame:
    """Top-k first-iteration BPE merge candidates per group:
    ``(group_col, pair, pair_count, rank)``, ties broken pair-asc.

    The ranking window runs over the aggregated (group, pair) table —
    |Σ²|-bounded per group (a few thousand rows for natural text),
    never over raw tokens, so per-group skew cannot grow with corpus
    size.
    """
    pc = pair_counts(word_freqs(df, text_col, (group_col,)), (group_col,))
    w = Window.partitionBy(group_col).orderBy(
        F.col("pair_count").desc(), F.col("pair").asc())
    return (pc.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


def _merge_seq(sym: tuple[str, ...], a: str, b: str) -> tuple[str, ...]:
    """Replace every non-overlapping left-to-right (a, b) adjacency in
    ``sym`` with the merged symbol a+b."""
    out: list[str] = []
    i, n = 0, len(sym)
    while i < n:
        if i + 1 < n and sym[i] == a and sym[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def learn_bpe_merges(df: DataFrame, num_merges: int,
                     text_col: str = "text", max_vocab: int = 100_000,
                     min_freq: int = 1) -> list[tuple[str, str]]:
    """Learn a BPE merge table from the corpus (Sennrich alg. 1).

    Distributed part: ``word_freqs`` (the one corpus-sized pass), then
    a deterministic head cap — ``row_number`` over (count desc, word
    asc) ≤ ``max_vocab`` — so the driver collect is bounded by
    ``max_vocab`` REGARDLESS of corpus size (10^12 docs collect the
    same ≤ max_vocab rows as 10^3 docs do). Driver part: the merge
    recurrence is inherently sequential, so the right split is "corpus
    work on the cluster, vocab work on the driver" — and the driver
    loop is the INCREMENTAL trainer (subword-nmt style): pair counts
    are built once, each merge pops the max off a lazy-deletion heap
    and re-counts ONLY the words that contain the merged pair (tracked
    by a pair→words index), so per-merge cost is proportional to the
    affected words, not to max_vocab — the difference between minutes
    and days at the 50k-merge / 100k-vocab scale ``apply_bpe``
    advertises. Output is EXACTLY the textbook recurrence's (the
    naive-equivalence property test pins it): the heap orders by
    (-count, pair), the same total order the from-scratch argmax uses.

    Deterministic everywhere: the cap tie-breaks on the word, the merge
    choice tie-breaks on the pair (max count, then lexicographically
    smallest pair). Stops early when no pair remains (fully merged
    vocabulary). Returns the ordered merge list — rank = list index.
    """
    if num_merges < 0:
        raise ValueError(f"num_merges must be >= 0, got {num_merges}")
    wf = word_freqs(df, text_col)
    if min_freq > 1:
        wf = wf.where(F.col("c") >= min_freq)
    # sort+limit compiles to TakeOrderedAndProject — a DISTRIBUTED
    # top-k (per-partition heaps + driver merge), never a
    # single-partition global window over the vocabulary
    head = (wf.orderBy(F.col("c").desc(), F.col("w").asc())
            .limit(max_vocab)
            .select("w", "c"))
    vocab: dict[tuple[str, ...], int] = {
        tuple(r["w"]): int(r["c"]) for r in head.collect()}
    return _learn_from_vocab(vocab, num_merges)


def _learn_from_vocab(vocab: dict[tuple[str, ...], int],
                      num_merges: int) -> list[tuple[str, str]]:
    """The driver-side incremental merge loop over an in-memory
    word-frequency dict (``vocab`` is consumed). Split out of
    ``learn_bpe_merges`` so the naive-recurrence equivalence property
    test can drive it directly, without a Spark pass per example."""
    # one full counting pass, then incremental maintenance: counts is
    # the exact pair→frequency table at all times; index maps each pair
    # to the vocab keys currently containing it. Distinct words keep
    # distinct symbol tuples forever (merging never changes a word's
    # character concatenation), so merged keys never collide.
    counts: dict[tuple[str, str], int] = {}
    index: dict[tuple[str, str], set[tuple[str, ...]]] = {}
    for sym, freq in vocab.items():
        for pair in zip(sym, sym[1:]):
            counts[pair] = counts.get(pair, 0) + freq
            index.setdefault(pair, set()).add(sym)
    # lazy-deletion max-heap: entries go stale when a count changes;
    # the pop loop discards any entry disagreeing with counts. Tuple
    # order (-count, pair) == the textbook argmax's tie-break, so the
    # winner each round is identical to a from-scratch recount.
    heap = [(-c, p) for p, c in counts.items()]
    heapq.heapify(heap)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        best = None
        while heap:
            negc, p = heap[0]
            if counts.get(p) == -negc:
                best = p
                break
            heapq.heappop(heap)  # stale
        if best is None:
            break
        merges.append(best)
        a, b = best
        changed: set[tuple[str, str]] = set()
        for sym in index.pop(best, ()):  # only words containing (a, b)
            freq = vocab.pop(sym)
            for pair in zip(sym, sym[1:]):
                left = counts[pair] - freq
                if left > 0:
                    counts[pair] = left
                    changed.add(pair)
                else:
                    del counts[pair]
                    changed.discard(pair)
                entry = index.get(pair)
                if entry is not None:
                    entry.discard(sym)
                    if not entry:
                        del index[pair]
            new = _merge_seq(sym, a, b)
            vocab[new] = freq
            for pair in zip(new, new[1:]):
                counts[pair] = counts.get(pair, 0) + freq
                changed.add(pair)
                index.setdefault(pair, set()).add(new)
        for pair in changed:
            heapq.heappush(heap, (-counts[pair], pair))
    return merges


def bpe_segment_word(word: str, ranks: dict[tuple[str, str], int]
                     ) -> tuple[str, ...]:
    """Segment one word with a learned merge table: repeatedly merge the
    LOWEST-RANK adjacent pair (the GPT-2 ``bpe()`` recurrence). Applying
    merges in training order reproduces the training segmentation
    exactly — the property ``test_bpe.py`` pins."""
    sym = tuple(word)
    while len(sym) > 1:
        ranked = [(ranks[p], p) for p in zip(sym, sym[1:]) if p in ranks]
        if not ranked:
            break
        _, (a, b) = min(ranked)
        sym = _merge_seq(sym, a, b)
    return sym


def word_tokenizer_udf(segment_word):
    """Scalar Arrow pandas-UDF factory shared by every subword
    tokenizer's apply path (``apply_bpe`` here, ``apply_unigram`` in
    ``operators/unigram.py``): ONE statement of the repo's whitespace
    contract and the memo bound, so the two tokenizers cannot drift.

    ``segment_word`` (str → sequence of tokens, plus whatever model it
    closes over) rides the serialized UDF once per executor — the
    ship-once lifecycle of ``functions/models.py``'s broadcast models;
    merge tables / lexicons are tiny (50k entries ≈ a few hundred KiB).

    Scale shape: a SCALAR pandas UDF — only the text column crosses the
    Python boundary; every other column (html binaries, metadata) stays
    JVM-side, unlike a mapInPandas enrichment which would round-trip
    whole rows through Arrow. A bounded per-task word→tokens memo
    collapses per-token cost to per-DISTINCT-word cost, a 10-100× cut
    on Zipf-distributed web text. Null text → null tokens.
    """
    # mirror words_expr's Java-regex \s+ EXACTLY: Java \s is the ASCII
    # class [ \t\n\x0b\f\r] — Python str.split() also breaks on Unicode
    # whitespace (\xa0 etc.) and would disagree on mojibake-bearing text
    ws = re.compile("[ \t\n\x0b\f\r]+")
    memo_cap = 1_000_000  # reset past this, don't grow unbounded
    # the closure dict deserializes empty with each task, then persists
    # across that task's Arrow batches — hot words segment once per task
    memo: dict[str, list[str]] = {}

    @pandas_udf(ArrayType(StringType()))
    def tokenize(texts: pd.Series) -> pd.Series:
        def tok(text):
            if text is None:
                return None
            out: list[str] = []
            for wrd in ws.split(text):
                if not wrd:
                    continue
                got = memo.get(wrd)
                if got is None:
                    if len(memo) >= memo_cap:
                        memo.clear()
                    got = list(segment_word(wrd))
                    memo[wrd] = got
                out.extend(got)
            return out

        return texts.map(tok)

    return tokenize


def apply_bpe(df: DataFrame, merges: Sequence[tuple[str, str]],
              text_col: str = "text",
              out_col: str = "bpe_tokens") -> DataFrame:
    """Tokenize ``text_col`` with a learned merge table: adds
    ``out_col array<string>`` (null text → null tokens). Plan shape and
    lifecycle: see ``word_tokenizer_udf``."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    tokenize = word_tokenizer_udf(lambda w: bpe_segment_word(w, ranks))
    return df.withColumn(out_col, tokenize(F.col(text_col)))
