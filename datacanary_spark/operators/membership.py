"""Bloom-filter membership: broadcast-bitset semi/anti joins.

The decontamination anti-join (operators/dedup.py::decontaminate)
shuffles or broadcasts the reference fingerprints themselves. At
10^9-item reference scale the raw fingerprint strings are tens of GB —
too big to broadcast — while their Bloom bitset at ``fpp=1e-3`` is
~1.7 GB and at ``fpp=1e-2`` ~1.2 GB; per-executor that is a one-time
broadcast instead of shuffling the 100-TB corpus's fingerprints. This
is the same trick Spark's own runtime bloom-filter join
(`spark.sql.optimizer.runtime.bloomFilter.enabled`) applies to shuffle
joins, made explicit and composable so the curation pipeline can
build the bitset ONCE and reuse it across many corpus passes.

Correctness contract: a Bloom filter has false positives but NO false
negatives, so it is used strictly as a PREFILTER — rows the bitset
rejects are definitively clean and skip the join; rows it accepts
(true hits + ~fpp of the rest) go through the ordinary EXACT anti-join
for confirmation. The final result is therefore exactly the plain
anti-join's (pinned by tests and by the driver's DuckDB oracle, which
runs the plain NOT EXISTS form).

Plan shape: build = one explode + one bit_or aggregation over the
reference (rows out ≤ m/64 regardless of reference size), one bounded
driver collect of the packed words; probe = per-row hashing in
whole-stage codegen. Membership testing has the same two dispatch
forms as the ANN assignment (similarity.py::LITERAL_ASSIGN_BUDGET):
small bitsets inline as an array<bigint> plan literal (pure Column
expressions — zero Python), large ones broadcast as a numpy word array
probed by one Arrow pandas UDF per frame.

Hashing: probe ``i`` of key ``x`` is ``pmod(xxhash64(x, i), m)`` —
computed JVM-side in BOTH dispatch modes (the UDF receives the
positions array, never the key), so Python never re-implements the
hash and the two modes cannot drift.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# Max packed 64-bit words a membership expression may embed as a plan
# literal (same rationale as similarity.LITERAL_ASSIGN_BUDGET: keep
# Catalyst analysis and codegen flat). 4096 words = 256 Kbit = 32 KB.
LITERAL_WORDS_BUDGET = 4096


@dataclass(frozen=True)
class BloomSpec:
    """Packed Bloom bitset + its probe geometry.

    ``words[w] >> b & 1`` is bit ``w*64 + b``; ``m_bits`` is always a
    multiple of 64 so every position maps inside ``words``.
    """

    m_bits: int
    k: int
    words: np.ndarray  # int64[m_bits // 64]

    @property
    def n_set_bits(self) -> int:
        return int(np.unpackbits(
            self.words.astype("<i8").view(np.uint8)).sum())


def bloom_geometry(expected_items: int, fpp: float = 1e-3) -> tuple[int, int]:
    """Standard sizing: ``m = -n ln p / (ln 2)^2`` bits rounded up to a
    multiple of 64, ``k = (m/n) ln 2`` probes (≥ 1)."""
    if expected_items <= 0:
        return 64, 1
    if not (0.0 < fpp < 1.0):
        raise ValueError(f"fpp must be in (0, 1), got {fpp}")
    m = -expected_items * math.log(fpp) / (math.log(2) ** 2)
    m_bits = max(64, 64 * math.ceil(m / 64))
    k = max(1, round(m_bits / expected_items * math.log(2)))
    return m_bits, k


def _probe_exprs(key_col: Column, m_bits: int, k: int) -> list[Column]:
    """The k probe positions of a key — pure JVM expressions, shared by
    build and both membership dispatch modes."""
    return [F.pmod(F.xxhash64(key_col, F.lit(i)), F.lit(m_bits))
            for i in range(k)]


def build_bloom(ref: DataFrame, key_col: str, m_bits: int,
                k: int) -> BloomSpec:
    """Distributed bitset build over the reference's ``key_col``.

    Explode each key's k probe positions, aggregate per 64-bit word
    with ``bit_or`` (map-side partial agg collapses duplicates before
    the shuffle), collect ≤ m/64 (word_ix, word) rows. NULL keys
    contribute nothing (a NULL key has no identity — mirrors
    content_fingerprint's null contract).
    """
    if m_bits % 64 != 0 or m_bits <= 0:
        raise ValueError(f"m_bits must be a positive multiple of 64: {m_bits}")
    key = F.col(key_col)
    pos = (ref.where(key.isNotNull())
              .select(F.explode(F.array(*_probe_exprs(key, m_bits, k)))
                      .alias("pos")))
    packed = (pos.select(
        F.shiftright("pos", 6).alias("word_ix"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))")
        .alias("mask"))
        .groupBy("word_ix").agg(F.bit_or("mask").alias("word")))
    words = np.zeros(m_bits // 64, dtype=np.int64)
    # Arrow collect, not Row collect: ≤ m/64 rows by construction, but
    # at a 10^9-item reference that is ~2·10^8 rows — as pyspark Row
    # objects that is ~10× the bitset's own memory on the driver;
    # toPandas keeps it at two int64 columns. Values are already signed
    # 64-bit from Spark's bit_or — assign directly (no uint64 wrap
    # round-trip, which NumPy 2 rejects for negative words).
    pdf = packed.toPandas()
    words[pdf["word_ix"].to_numpy(dtype=np.int64)] = \
        pdf["word"].to_numpy(dtype=np.int64)
    return BloomSpec(m_bits=m_bits, k=k, words=words)


def _resolve_mode(mode: str, n_words: int) -> str:
    if mode == "auto":
        return "literal" if n_words <= LITERAL_WORDS_BUDGET else "udf"
    if mode not in ("literal", "udf"):
        raise ValueError(f"unknown mode: {mode!r} (auto|literal|udf)")
    return mode


def might_contain_expr(key_col: Column, spec: BloomSpec,
                       mode: str = "auto") -> Column:
    """Boolean membership test against ``spec`` for each row's key.

    NULL keys test NULL (three-valued: unknown content is neither in
    nor out — callers decide with ``coalesce``). ``mode="literal"``
    inlines the words as one array<bigint> plan literal and tests bits
    with element_at+getbit (whole-stage codegen, DuckDB-twin-able);
    ``mode="udf"`` broadcasts the numpy word array once per executor
    and probes it with a single Arrow pandas UDF over the JVM-computed
    positions array — plan size flat in ``m_bits``. Both modes probe
    identical positions (the hash never leaves the JVM); equivalence
    is pinned by tests.
    """
    resolved = _resolve_mode(mode, spec.words.size)
    probes = _probe_exprs(key_col, spec.m_bits, spec.k)
    if resolved == "literal":
        words_lit = F.lit([int(w) for w in spec.words])
        cond = None
        for pos in probes:
            word = F.element_at(
                words_lit, (F.shiftright(pos, 6) + F.lit(1)).cast("int"))
            c = F.getbit(word, F.pmod(pos, F.lit(64))) == F.lit(1)
            cond = c if cond is None else cond & c
        hit = cond
    else:
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        bc = spark.sparkContext.broadcast(spec.words)

        @pandas_udf(T.BooleanType())
        def _member(pos: pd.Series) -> pd.Series:
            w = bc.value.view(np.uint64)
            if len(pos) == 0:
                return pd.Series([], dtype=bool)
            mat = np.stack(pos.to_numpy()).astype(np.uint64)  # (batch, k)
            bits = (w[mat >> np.uint64(6)] >> (mat & np.uint64(63))) \
                & np.uint64(1)
            return pd.Series(bits.all(axis=1))

        hit = _member(F.array(*probes))
    return F.when(key_col.isNull(), F.lit(None).cast("boolean")) \
        .otherwise(hit)


def decontaminate_bloom(corpus: DataFrame, reference: DataFrame,
                        text_col: str = "text",
                        ref_text_col: str = "text",
                        fpp: float = 1e-3,
                        expected_items: int | None = None,
                        mode: str = "auto",
                        persist=False) -> DataFrame:
    """Exact-decontamination semantics (dedup.decontaminate
    ``mode="exact"``) with a Bloom prefilter: corpus docs whose
    normalized content fingerprint appears in the reference are
    dropped; null-text docs always survive.

    Pipeline: (1) distinct reference fingerprints; (2) bitset build
    (``expected_items`` skips the sizing count when the caller knows
    the reference cardinality); (3) scan-side bitset test splits the
    corpus — bitset-miss rows are definitively clean and bypass the
    join entirely; (4) only bitset-hit rows (true hits + ~fpp noise)
    reach the exact anti-join confirmation. At fpp=1e-3 the confirm
    join's corpus side is ~0.1% of rows plus the true contamination —
    the 100-TB shuffle the plain anti-join would need disappears.
    Result is EXACTLY the plain anti-join's (no false negatives by
    construction; equality pinned by tests + the driver oracle).

    Plan-shape caveat: the clean/confirm split is a UNION of two
    branches over ``corpus`` — unpersisted, each branch re-scans the
    input and re-hashes the fingerprint + k probes. The default leaves
    that re-scan in place (re-reading a 100-TB parquet corpus twice is
    usually cheaper than caching it — same judgment call as
    dedup.decontaminate); pass ``persist=True`` or a CacheScope to pin
    the fingerprint+probe projection once when the corpus is small or
    expensive to recompute. ``reference`` is always read twice (bitset
    build + confirm join) but its distinct-fingerprint frame is
    reference-sized, not corpus-sized.
    """
    from datacanary_spark.operators.text_analysis import content_fingerprint
    from datacanary_spark.plans.caching import maybe_persist

    ref_fp = (reference
              .select(content_fingerprint(F.col(ref_text_col)).alias("_fp"))
              .where(F.col("_fp").isNotNull()).distinct())
    if expected_items is None:
        expected_items = ref_fp.count()
    m_bits, k = bloom_geometry(expected_items, fpp)
    spec = build_bloom(ref_fp, "_fp", m_bits, k)

    from datacanary_spark.plans.partitioning import spread_to_parallelism

    # fingerprint + k probes per row is the heavy map stage: spread a
    # single-split corpus scan across cores (no-op at real scale)
    keyed = spread_to_parallelism(corpus).withColumn(
        "_fp", content_fingerprint(F.col(text_col)))
    maybe = F.coalesce(might_contain_expr(F.col("_fp"), spec, mode),
                       F.lit(False))
    keyed = maybe_persist(keyed.withColumn("_maybe", maybe), persist)
    clean = keyed.where(~F.col("_maybe"))
    confirmed_clean = (keyed.where(F.col("_maybe"))
                       .join(ref_fp, "_fp", "left_anti"))
    return clean.unionByName(confirmed_clean).drop("_fp", "_maybe")
