"""Driver-contract queries: unicode normalization, mojibake detection,
deterministic train/val/test split, and global corpus shuffle.

Registered into datacanary_spark.entry_queries.{QUERIES,ORACLE_SQL}.
The fixture `documents` text is already NFC-clean ASCII-heavy prose, so
the NFC/mojibake queries INJECT denormalized sequences deterministically
— with the same replace() on both engines — before running the
operator; what is verified cross-engine is the normalization itself
(DuckDB's utf8proc NFC vs Python's unicodedata NFC) and the artifact
counting (RE2 vs Java regex over a literal alternation).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datacanary_spark.entry_queries import _t, register
from datacanary_spark.functions import normalize as nz
from datacanary_spark.operators import corpus_stats as cs
from datacanary_spark.operators import text_analysis as ta

# ---------------------------------------------------------------------------
# Unicode NFC normalization
# ---------------------------------------------------------------------------

_COMBINING_ACUTE = "\u0301"  # COMBINING ACUTE ACCENT (chr(769) in the SQL)


@register(
    "unicode_nfc_by_lang",
    """
    WITH injected AS (
      SELECT lang, replace(text, 'e', 'e' || chr(769)) AS t
      FROM documents
    )
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN nfc_normalize(t) <> t THEN 1 ELSE 0 END)
                AS BIGINT) AS changed_docs,
           CAST(sum(length(t)) AS BIGINT) AS chars_before,
           CAST(sum(length(nfc_normalize(t))) AS BIGINT) AS chars_after
    FROM injected
    GROUP BY lang
    """,
)
def unicode_nfc_by_lang(spark, sf_dir):
    """NFC normalization pass over deterministically-decomposed text:
    every 'e' becomes e + U+0301 (combining acute), NFC recomposes it
    to the single codepoint é. Verifies the pandas-UDF normalizer
    against DuckDB's utf8proc NFC — codepoint counts before/after pin
    the composition exactly. Narrow plan: inject + normalize fuse into
    one projection ahead of the groupBy."""
    d = _t(spark, sf_dir, "documents")
    t = F.replace(F.col("text"), F.lit("e"),
                  F.lit("e" + _COMBINING_ACUTE))
    norm = nz.make_normalize_udf("NFC")(t)
    return (d.select("lang", t.alias("t"), norm.alias("n"))
             .groupBy("lang")
             .agg(F.count(F.lit(1)).alias("n_docs"),
                  F.sum(F.when(F.col("n") != F.col("t"), 1)
                         .otherwise(0)).cast("long").alias("changed_docs"),
                  F.sum(F.length("t")).cast("long").alias("chars_before"),
                  F.sum(F.length("n")).cast("long").alias("chars_after")))


# ---------------------------------------------------------------------------
# Mojibake detection (JVM-side literal-alternation count)
# ---------------------------------------------------------------------------


@register(
    "mojibake_hits_by_lang",
    f"""
    WITH injected AS (
      SELECT lang, doc_id,
             replace(replace(text, 'th', 'â€™'), 'an', 'Ã©') AS t
      FROM documents
    ),
    hits AS (
      SELECT lang, doc_id,
             CAST(len(regexp_extract_all(t, '{nz.MOJIBAKE_PATTERN}'))
                  AS BIGINT) AS h
      FROM injected
    )
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN h > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS docs_with_hits,
           CAST(sum(h) AS BIGINT) AS total_hits,
           CAST(sum(doc_id * h) AS BIGINT) AS hit_weight
    FROM hits
    GROUP BY lang
    """,
)
def mojibake_hits_by_lang(spark, sf_dir):
    """Mojibake artifact counting over deterministically-broken text
    ('th'→â€™, 'an'→Ã© — the cp1252 renderings of ’ and é). The count
    is a pure regexp_count expression (no artifact is a prefix of
    another, so Java regex and RE2 agree exactly); repair itself is
    Python-side and pinned by the pytest golden twin instead.
    hit_weight = sum(doc_id·hits) pins per-doc counts, not just totals."""
    d = _t(spark, sf_dir, "documents")
    t = F.replace(F.replace(F.col("text"), F.lit("th"), F.lit("â€™")),
                  F.lit("an"), F.lit("Ã©"))
    h = nz.mojibake_count_expr(t).cast("long")
    return (d.select("lang", F.col("doc_id"), h.alias("h"))
             .groupBy("lang")
             .agg(F.count(F.lit(1)).alias("n_docs"),
                  F.sum(F.when(F.col("h") > 0, 1).otherwise(0))
                   .cast("long").alias("docs_with_hits"),
                  F.sum("h").cast("long").alias("total_hits"),
                  F.sum(F.col("doc_id") * F.col("h"))
                   .cast("long").alias("hit_weight")))


# ---------------------------------------------------------------------------
# Deterministic train/val/test split
# ---------------------------------------------------------------------------

_SPLITS = {"train": 0.8, "val": 0.1, "test": 0.1}


@register(
    "train_split_counts",
    f"""
    WITH assigned AS (
      SELECT lang, doc_id,
             {cs.duck_split_case('doc_id', _SPLITS)} AS split
      FROM documents
    )
    SELECT lang, split, count(*) AS n_docs,
           CAST(sum(doc_id) AS BIGINT) AS sum_id
    FROM assigned
    GROUP BY lang, split
    """,
)
def train_split_counts(spark, sf_dir):
    """80/10/10 train/val/test assignment as a pure function of doc_id
    (cumulative lexicographic md5 thresholds): membership is pinned by
    sum(doc_id) per (lang, split), so the oracle catches any row landing
    in a different split, not just count drift. No shuffle — the CASE
    is a narrow projection; adding data later never reassigns a doc."""
    d = _t(spark, sf_dir, "documents")
    assigned = cs.split_assign(d, "doc_id", dict(_SPLITS), salt="split")
    return (assigned.groupBy("lang", "split")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("doc_id").cast("long").alias("sum_id")))


# ---------------------------------------------------------------------------
# Global deterministic corpus shuffle → shards
# ---------------------------------------------------------------------------


@register(
    "corpus_shuffle_shards",
    """
    WITH s AS (
      SELECT doc_id,
             md5('shuffle:' || CAST(doc_id AS VARCHAR)) AS k
      FROM documents
    )
    SELECT CAST(CAST(('0x' || substring(k, 1, 8)) AS BIGINT) % 13 AS INT)
               AS shard,
           count(*) AS n_docs,
           min(k) AS first_key,
           max(k) AS last_key,
           CAST(sum(doc_id) AS BIGINT) AS sum_id
    FROM s
    GROUP BY 1
    """,
)
def corpus_shuffle_shards(spark, sf_dir):
    """Training-output shuffle: shard = md5-prefix mod 13 (prime, so
    the modulo path is exercised), order key = the full digest. The
    per-shard min/max order keys + sum(doc_id) pin both the shard
    assignment and the permutation's key material cross-engine. One
    hash Exchange; no global sort, no sampling pass."""
    d = _t(spark, sf_dir, "documents")
    sharded = cs.shuffle_to_shards(d, "doc_id", 13, salt="shuffle")
    return (sharded.groupBy("shard")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.min("shuffle_key").alias("first_key"),
                 F.max("shuffle_key").alias("last_key"),
                 F.sum("doc_id").cast("long").alias("sum_id")))


# ---------------------------------------------------------------------------
# Script-mix signal (mixed-script spam detection)
# ---------------------------------------------------------------------------

_SCRIPT_INJECT_SQL = """
      SELECT lang, doc_id,
             CASE WHEN doc_id % 8 = 0
                    THEN replace(replace(text, 'a', 'я'), 'o', 'ω')
                  WHEN doc_id % 4 = 0 THEN replace(text, 'a', 'я')
                  ELSE text END AS t
      FROM documents
"""


@register(
    "script_mix_by_lang",
    f"""
    WITH injected AS ({_SCRIPT_INJECT_SQL}),
    counted AS (
      SELECT lang,
             CAST(len(regexp_extract_all(t, '\\p{{L}}')) AS BIGINT)
                 AS letters,
             CAST(len(regexp_extract_all(t, '[^\\P{{Latin}}\\P{{L}}]')) AS BIGINT)
                 AS lat,
             CAST(len(regexp_extract_all(t, '[^\\P{{Cyrillic}}\\P{{L}}]')) AS BIGINT)
                 AS cyr,
             CAST(len(regexp_extract_all(t, '[^\\P{{Greek}}\\P{{L}}]')) AS BIGINT)
                 AS grk
      FROM injected
    ),
    flagged AS (
      SELECT lang, letters, lat, cyr, grk,
             (CASE WHEN CAST(lat AS DOUBLE) / NULLIF(letters, 0) >= 0.05
                   THEN 1 ELSE 0 END
              + CASE WHEN CAST(cyr AS DOUBLE) / NULLIF(letters, 0) >= 0.05
                     THEN 1 ELSE 0 END
              + CASE WHEN CAST(grk AS DOUBLE) / NULLIF(letters, 0) >= 0.05
                     THEN 1 ELSE 0 END) >= 2 AS mixed
      FROM counted
    )
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN mixed THEN 1 ELSE 0 END) AS BIGINT)
               AS mixed_docs,
           CAST(sum(letters) AS BIGINT) AS letter_chars,
           CAST(sum(lat) AS BIGINT) AS latin_chars,
           CAST(sum(cyr) AS BIGINT) AS cyrillic_chars,
           CAST(sum(grk) AS BIGINT) AS greek_chars
    FROM flagged
    GROUP BY lang
    """,
)
def script_mix_by_lang(spark, sf_dir):
    """Mixed-script detection over deterministically-injected Cyrillic/
    Greek lookalikes (every 4th doc gets я for a, every 8th ω for o —
    the homoglyph-spam shape). Counting is regexp_count over Unicode
    SCRIPT classes (Java \\p{{IsX}} == RE2 \\p{{X}}, probed); the mixed
    flag is a single IEEE division + compare, bit-identical across
    engines. Integer char sums pin the counts exactly — no float
    aggregation in the oracle."""
    d = _t(spark, sf_dir, "documents")
    t = (F.when(F.col("doc_id") % 8 == 0,
                F.replace(F.replace(F.col("text"), F.lit("a"), F.lit("я")),
                          F.lit("o"), F.lit("ω")))
          .when(F.col("doc_id") % 4 == 0,
                F.replace(F.col("text"), F.lit("a"), F.lit("я")))
          .otherwise(F.col("text")))
    mixed = ta.with_script_mix(
        d.select("lang", "doc_id", t.alias("text")),
        scripts=["latin", "cyrillic", "greek"])
    return (mixed.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(F.when(F.col("mixed_script"), 1).otherwise(0))
                  .cast("long").alias("mixed_docs"),
                 F.sum("letter_chars").cast("long").alias("letter_chars"),
                 F.sum("latin_chars").cast("long").alias("latin_chars"),
                 F.sum("cyrillic_chars").cast("long")
                  .alias("cyrillic_chars"),
                 F.sum("greek_chars").cast("long").alias("greek_chars")))
