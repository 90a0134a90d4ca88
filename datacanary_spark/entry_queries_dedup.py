"""Driver-contract queries: deduplication + text-analysis operators.

Registered into datacanary_spark.entry_queries.{QUERIES,ORACLE_SQL}.
Where the corpus has no natural duplicates (the synthetic documents
table is all-distinct), queries construct deterministic variants inline
— identically on the Spark and DuckDB sides — so the operators
demonstrably FIND the planted duplicates rather than vacuously
returning empty sets.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datacanary_spark.entry_queries import (
    ORACLE_SQL,
    QUERIES,
    _TOKS,
    _t,
    register,
)
from datacanary_spark.operators import dedup as dd
from datacanary_spark.operators import text_analysis as ta
from datacanary_spark.sources.fixtures import LANGS, STOPWORDS

# ---------------------------------------------------------------------------
# Shared DuckDB fragments (mirror operators/dedup.py expressions exactly)
# ---------------------------------------------------------------------------

_NORM = r"lower(regexp_replace({col}, '\s+', ' ', 'g'))"

_SHINGLES = (
    "list_distinct(CASE WHEN length({n}) >= 5 THEN "
    "list_transform(generate_series(1, length({n}) - 4), i -> substring({n}, i, 5)) "
    "WHEN length({n}) > 0 THEN [{n}] ELSE CAST([] AS VARCHAR[]) END)"
)

_WORDS = "list_filter(regexp_split_to_array({col}, '\\s+'), x -> x <> '')"

_HIGH = "('8','9','a','b','c','d','e','f')"


def _duck_minhash_list(n_hashes: int) -> str:
    parts = ", ".join(
        f"list_min(list_transform(sh, x -> md5('{s}:' || x)))" for s in range(n_hashes))
    return f"[{parts}]"


def _duck_band_rows_from(table: str, id_sel: str, bands: int,
                         rows: int) -> str:
    selects = []
    for b in range(bands):
        key = " || '|' || ".join(f"sig[{b * rows + r + 1}]" for r in range(rows))
        selects.append(f"SELECT {id_sel}, {b} AS band_ix, {key} AS band_key "
                       f"FROM {table}")
    return " UNION ALL ".join(selects)


def _duck_band_rows(bands: int, rows: int) -> str:
    return _duck_band_rows_from("sig", "doc_id", bands, rows)


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

@register(
    "dedup_exact_groups",
    """
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
    )
    SELECT CASE WHEN text IS NULL THEN '<NULL>#' || doc_id
           ELSE md5(text) END AS text_md5,
           count(*) AS group_size,
           min(doc_id) AS canonical_id
    FROM corpus GROUP BY 1
    """,
)
def dedup_exact_groups(spark, sf_dir):
    """Exact dedup over a corpus with planted exact duplicates."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    aug = d.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text")
    return dd.exact_dup_groups(d.unionByName(aug))


@register(
    "dedup_exact_survivors",
    """
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
    )
    SELECT count(*) AS n_rows, count(DISTINCT doc_id) AS n_docs
    FROM corpus
    WHERE doc_id IN (
      SELECT min(doc_id) FROM corpus
      GROUP BY CASE WHEN text IS NULL THEN '<NULL>#' || doc_id
               ELSE md5(text) END
    )
    """,
)
def dedup_exact_survivors(spark, sf_dir):
    """dedup_exact keeps exactly one (min-id) row per distinct text."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    aug = d.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text")
    surv = dd.dedup_exact(d.unionByName(aug))
    return surv.agg(F.count(F.lit(1)).alias("n_rows"),
                    F.count_distinct("doc_id").alias("n_docs"))


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup (planted near-duplicates: appended trailer)
# ---------------------------------------------------------------------------

_TRAILER = " near duplicate trailer words appended here"

_MINHASH_SQL = f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 150
      UNION ALL
      SELECT doc_id + 100000 AS doc_id, text || '{_TRAILER}' AS text
      FROM documents WHERE doc_id < 150 AND doc_id % 3 = 0
    ),
    norm AS (SELECT doc_id, {_NORM.format(col='text')} AS nt FROM corpus),
    sh AS (SELECT doc_id, {_SHINGLES.format(n='nt')} AS sh FROM norm),
    sig AS (SELECT doc_id, {_duck_minhash_list(16)} AS sig FROM sh),
    bandrows AS ({_duck_band_rows(4, 4)}),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bandrows a JOIN bandrows b USING (band_ix, band_key)
      WHERE a.doc_id < b.doc_id
    ),
    scored AS (
      SELECT id_a, id_b,
             round(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
                   / len(list_distinct(list_concat(sa.sh, sb.sh))), 6) AS jaccard
      FROM cand
      JOIN sh sa ON sa.doc_id = cand.id_a
      JOIN sh sb ON sb.doc_id = cand.id_b
    )
    SELECT id_a, id_b, jaccard FROM scored WHERE jaccard >= 0.5
"""


def _minhash_corpus(spark, sf_dir):
    """The planted near-dup corpus every MinHash-pair query (and its
    shared _MINHASH_SQL oracle CTE) is defined over — single-sourced so
    the Spark side can never drift from the SQL side's corpus."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text").where(
        F.col("doc_id") < 150)
    aug = d.where(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(_TRAILER)).alias("text"))
    return d.unionByName(aug)


@register("dedup_minhash_lsh_pairs", _MINHASH_SQL)
def dedup_minhash_lsh_pairs(spark, sf_dir):
    """MinHash→LSH→Jaccard near-dup pairs over planted near-duplicates."""
    pairs = dd.near_dup_pairs(_minhash_corpus(spark, sf_dir), threshold=0.5)
    return pairs.select("id_a", "id_b", F.bround("jaccard", 6).alias("jaccard"))


# ---------------------------------------------------------------------------
# n-gram Jaccard (adjacent-doc similarity scan)
# ---------------------------------------------------------------------------

@register(
    "dedup_ngram_jaccard_adjacent",
    f"""
    WITH norm AS (
      SELECT doc_id, {_NORM.format(col='text')} AS nt FROM documents WHERE doc_id < 100
    ),
    sh AS (SELECT doc_id, {_SHINGLES.format(n='nt')} AS sh FROM norm)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
    FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
    """,
)
def dedup_ngram_jaccard_adjacent(spark, sf_dir):
    """Exact shingle-Jaccard between consecutive doc ids (background
    similarity level of the corpus)."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text").where(
        F.col("doc_id") < 100)
    pairs = d.select(F.col("doc_id").alias("id_a"),
                     (F.col("doc_id") + 1).alias("id_b"))
    j = dd.jaccard_for_pairs(d, pairs)
    # inner joins drop the last id (no id_a+1 row) automatically
    return j.select("id_a", "id_b", F.bround("jaccard", 6).alias("jaccard"))


# ---------------------------------------------------------------------------
# SimHash fingerprints
# ---------------------------------------------------------------------------

def _duck_simhash(tokens: str) -> str:
    bits = []
    for i in range(16):
        bits.append(
            f"CASE WHEN 2 * len(list_filter({tokens}, "
            f"t -> substring(md5(t), {i + 1}, 1) IN {_HIGH})) "
            f"- len({tokens}) > 0 THEN {1 << i} ELSE 0 END")
    return "(" + " + ".join(bits) + ")"


@register(
    "dedup_simhash_fingerprints",
    f"""
    WITH toks AS (
      SELECT doc_id, {_WORDS.format(col='text')} AS w
      FROM documents WHERE doc_id < 100
    )
    SELECT doc_id,
           -- null text => null tokens => null simhash (Spark's
           -- aggregate over a null array is NULL; the per-bit CASE
           -- would otherwise fall to ELSE 0 on the NULL condition)
           CASE WHEN w IS NULL THEN NULL
                ELSE CAST({_duck_simhash('w')} AS INT) END AS simhash
    FROM toks
    """,
)
def dedup_simhash_fingerprints(spark, sf_dir):
    """16-bit SimHash per document (Hamming-close ⇒ similar token sets)."""
    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    return d.select("doc_id",
                    dd.simhash16(ta.words_expr(F.col("text"))).alias("simhash"))


# ---------------------------------------------------------------------------
# Content fingerprints (whitespace-insensitive exact identity)
# ---------------------------------------------------------------------------

@register(
    "fingerprint_groups",
    """
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 100000 AS doc_id, replace(text, ' ', '  ') AS text
      FROM documents WHERE doc_id % 7 = 0
    )
    SELECT CASE WHEN text IS NULL THEN '<NULL>#' || doc_id
           ELSE md5(trim(lower(regexp_replace(text, '\\s+', ' ', 'g')))) END AS fp,
           count(*) AS group_size,
           min(doc_id) AS canonical_id
    FROM corpus GROUP BY 1
    """,
)
def fingerprint_groups(spark, sf_dir):
    """Normalized-content fingerprint groups: whitespace-mutated variants
    collapse onto their originals (raw md5 would not catch them)."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    aug = d.where(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.replace(F.col("text"), F.lit(" "), F.lit("  ")).alias("text"))
    corpus = d.unionByName(aug)
    fp = F.coalesce(
        ta.content_fingerprint(F.col("text")),
        F.concat(F.lit("<NULL>#"), F.col("doc_id").cast("string")))
    return (corpus.select(fp.alias("fp"), "doc_id")
            .groupBy("fp")
            .agg(F.count(F.lit(1)).alias("group_size"),
                 F.min("doc_id").alias("canonical_id")))


# ---------------------------------------------------------------------------
# Token counting + rule-based language-ID
# ---------------------------------------------------------------------------

@register(
    "token_counts_by_lang",
    f"""
    SELECT lang,
           CAST(sum(len({_WORDS.format(col='text')})) AS BIGINT) AS ws_tokens,
           CAST(sum(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\\s]')))
                AS BIGINT) AS bpe_tokens,
           round(avg(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\\s]'))), 6)
             AS avg_bpe_tokens
    FROM documents GROUP BY lang
    """,
)
def token_counts_by_lang(spark, sf_dir):
    """Corpus sizing in whitespace tokens and BPE-ish tokens."""
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.sum(ta.token_count_ws(F.col("text"))).alias("ws_tokens"),
        F.sum(ta.token_count_bpe(F.col("text"))).alias("bpe_tokens"),
        F.bround(F.avg(ta.token_count_bpe(F.col("text"))), 6).alias("avg_bpe_tokens"),
    )


def _duck_lang_guess() -> str:
    hits = {
        lang: (f"len(list_filter(w, x -> list_contains("
               f"{sorted(STOPWORDS[lang])!r}, x)))")
        for lang in LANGS
    }
    best = "greatest(" + ", ".join(hits.values()) + ")"
    case = "CASE "
    for lang in LANGS:
        case += f"WHEN {hits[lang]} = {best} AND {best} > 0 THEN '{lang}' "
    case += "ELSE 'und' END"
    return case


@register(
    "langid_rules_confusion",
    f"""
    WITH toks AS (
      SELECT lang, {_WORDS.format(col='text')} AS w FROM documents
    )
    SELECT lang, {_duck_lang_guess()} AS lang_guess, count(*) AS n
    FROM toks GROUP BY 1, 2
    """,
)
def langid_rules_confusion(spark, sf_dir):
    """Confusion matrix of the rule-based (stopword-argmax) language-ID
    against the table's true lang labels."""
    d = _t(spark, sf_dir, "documents")
    return (d.select("lang", ta.lang_guess_expr(F.col("text")).alias("lang_guess"))
             .groupBy("lang", "lang_guess")
             .agg(F.count(F.lit(1)).alias("n")))


# ---------------------------------------------------------------------------
# Winnowing fingerprints (partial-overlap tier; Schleimer et al. SIGMOD'03)
# ---------------------------------------------------------------------------

# DuckDB twin of operators/text_analysis.winnow_fingerprints(k=8, window=4);
# grams materialized once per row in a prior CTE (the oracle-side analogue
# of the Spark bind-the-array-first discipline).
_WINNOW_CTES = """
  wbase AS (
    SELECT doc_id, text IS NULL AS tnull,
           trim(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS nt
    FROM {src}
  ),
  wgrams AS (
    SELECT doc_id, tnull, CAST(length(nt) - 7 AS INT) AS ng,
           CASE WHEN NOT tnull AND length(nt) >= 8 THEN
             list_transform(generate_series(1, CAST(length(nt) - 7 AS INT)),
                            i -> md5(substring(nt, i, 8)))
           END AS grams
    FROM wbase
  ),
  wfps AS (
    SELECT doc_id,
           CASE WHEN tnull THEN NULL
                WHEN ng < 1 THEN CAST([] AS VARCHAR[])
                ELSE list_sort(list_distinct(list_transform(
                       generate_series(1, greatest(ng - 3, 1)),
                       j -> list_min(list_slice(grams, j, j + 3))))) END AS fps
    FROM wgrams
  )
"""


@register(
    "winnow_fingerprint_stats",
    f"""
    WITH {_WINNOW_CTES.format(src='(SELECT doc_id, text FROM documents WHERE doc_id < 200)')}
    SELECT doc_id, CAST(len(fps) AS BIGINT) AS n_fps,
           list_min(fps) AS fp_min, list_max(fps) AS fp_max
    FROM wfps
    """,
)
def winnow_fingerprint_stats(spark, sf_dir):
    """Winnowing fingerprint set per document (count + extremes): the
    rolling-hash local-fingerprinting tier between whole-doc identity
    and MinHash resemblance."""
    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    # bind the fingerprint array ONCE; three references to the raw
    # higher-order expression would each recompute it (HOFs are outside
    # Spark subexpression elimination)
    b = d.select("doc_id",
                 ta.winnow_fingerprints(F.col("text")).alias("_fps"))
    return b.select("doc_id",
                    F.size("_fps").cast("long").alias("n_fps"),
                    F.array_min("_fps").alias("fp_min"),
                    F.array_max("_fps").alias("fp_max"))


@register(
    "winnow_overlap_pairs",
    f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 150
      UNION ALL
      SELECT doc_id + 100000 AS doc_id,
             'COPIED PASSAGE: ' || substring(text, 1, 120) ||
             ' plus entirely new trailing commentary unique to variant ' ||
             doc_id AS text
      FROM documents WHERE doc_id < 150 AND doc_id % 10 = 0 AND text IS NOT NULL
    ),
    {_WINNOW_CTES.format(src='corpus')},
    posting AS (
      SELECT doc_id, unnest(fps) AS fp FROM wfps
    ),
    kept AS (
      SELECT fp, doc_id FROM posting
      QUALIFY count(*) OVER (PARTITION BY fp) <= 50
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           count(*) AS shared_fps
    FROM kept a JOIN kept b USING (fp)
    WHERE a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING count(*) >= 5
    """,
)
def winnow_overlap_pairs(spark, sf_dir):
    """Copied-passage detection: planted variants embed a 120-char
    passage from their source doc inside otherwise-new text; the
    winnowing posting-list join must surface exactly those pairs."""
    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 150)
    aug = d.where((F.col("doc_id") % 10 == 0) & F.col("text").isNotNull()).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.lit("COPIED PASSAGE: "),
                 F.substring(F.col("text"), 1, 120),
                 F.lit(" plus entirely new trailing commentary unique"
                       " to variant "),
                 F.col("doc_id").cast("string")).alias("text"))
    corpus = d.select("doc_id", "text").unionByName(aug)
    return dd.winnow_overlap_pairs(corpus, min_shared=5, max_posting=50)


# ---------------------------------------------------------------------------
# C4-style line-level corpus dedup
# ---------------------------------------------------------------------------

@register(
    "c4_line_dedup",
    """
    WITH corpus AS (
      SELECT doc_id,
             'SHARED HEADER NAVIGATION MENU' || chr(10) ||
             substring(text, 1, 100) || chr(10) ||
             substring(text, 1, 100) || chr(10) ||
             'SHARED FOOTER COPYRIGHT NOTICE' AS text
      FROM documents WHERE doc_id < 100 AND text IS NOT NULL
    ),
    lines AS (
      SELECT doc_id, generate_subscripts(ls, 1) AS pos, unnest(ls) AS ln
      FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM corpus)
    ),
    ranked AS (
      SELECT doc_id, pos, ln,
             CASE WHEN length(ln) >= 1 THEN
               row_number() OVER (PARTITION BY md5(ln) ORDER BY doc_id, pos)
             ELSE 1 END AS rn
      FROM lines
    )
    SELECT c.doc_id, coalesce(k.text, '') AS text
    FROM corpus c LEFT JOIN (
      SELECT doc_id, string_agg(ln, chr(10) ORDER BY pos) AS text
      FROM ranked WHERE rn = 1 GROUP BY doc_id) k USING (doc_id)
    """,
)
def c4_line_dedup(spark, sf_dir):
    """Line-level corpus dedup (C4-style): planted shared header/footer
    lines survive only in the first document; the repeated middle line
    survives only at its first position; each doc's unique content is
    untouched."""
    d = _t(spark, sf_dir, "documents").where(
        (F.col("doc_id") < 100) & F.col("text").isNotNull())
    mid = F.substring(F.col("text"), 1, 100)
    corpus = d.select("doc_id", F.concat_ws(
        "\n", F.lit("SHARED HEADER NAVIGATION MENU"), mid, mid,
        F.lit("SHARED FOOTER COPYRIGHT NOTICE")).alias("text"))
    return dd.dedup_lines(corpus)


@register(
    "paragraph_dedup",
    """
    WITH corpus AS (
      SELECT doc_id,
             'SHARED HEADER NAVIGATION MENU' || chr(10) || chr(10) ||
             substring(text, 1, 100) || chr(10) || chr(10) ||
             substring(text, 1, 100) || chr(10) || chr(10) ||
             'SHARED FOOTER COPYRIGHT NOTICE' AS text
      FROM documents WHERE doc_id < 100 AND text IS NOT NULL
    ),
    paras AS (
      SELECT doc_id, generate_subscripts(ps, 1) AS pos, unnest(ps) AS p
      FROM (SELECT doc_id, string_split(text, chr(10) || chr(10)) AS ps
            FROM corpus)
    ),
    ranked AS (
      SELECT doc_id, pos, p,
             CASE WHEN length(p) >= 1 THEN
               row_number() OVER (PARTITION BY md5(p) ORDER BY doc_id, pos)
             ELSE 1 END AS rn
      FROM paras
    )
    SELECT c.doc_id, coalesce(k.text, '') AS text
    FROM corpus c LEFT JOIN (
      SELECT doc_id, string_agg(p, chr(10) || chr(10) ORDER BY pos) AS text
      FROM ranked WHERE rn = 1 GROUP BY doc_id) k USING (doc_id)
    """,
)
def paragraph_dedup(spark, sf_dir):
    """Paragraph-level corpus dedup (RefinedWeb/Dolma granularity):
    planted shared header/footer paragraphs survive only in the first
    document; the repeated middle paragraph survives only at its first
    position and is removed WHOLE elsewhere (its internal lines stay
    intact in the survivor)."""
    d = _t(spark, sf_dir, "documents").where(
        (F.col("doc_id") < 100) & F.col("text").isNotNull())
    mid = F.substring(F.col("text"), 1, 100)
    corpus = d.select("doc_id", F.concat_ws(
        "\n\n", F.lit("SHARED HEADER NAVIGATION MENU"), mid, mid,
        F.lit("SHARED FOOTER COPYRIGHT NOTICE")).alias("text"))
    return dd.dedup_lines(corpus, sep="\n\n")


# ---------------------------------------------------------------------------
# Decontamination (benchmark/test-set overlap removal)
# ---------------------------------------------------------------------------

def _winnow_ctes(src: str, p: str) -> str:
    """_WINNOW_CTES with prefixed CTE names so two corpora can be
    winnowed in one oracle query."""
    s = _WINNOW_CTES.format(src=src)
    for name in ("wbase", "wgrams", "wfps"):
        s = s.replace(name, p + name[1:])
    return s


@register(
    "decontaminate_exact_survivors",
    """
    SELECT count(*) AS n_survivors, CAST(sum(doc_id) AS BIGINT) AS sum_ids
    FROM documents c
    WHERE doc_id < 150 AND (text IS NULL OR NOT EXISTS (
      SELECT 1 FROM documents r
      WHERE r.doc_id % 7 = 0 AND r.text IS NOT NULL
        AND md5(trim(lower(regexp_replace(r.text, '\\s+', ' ', 'g'))))
          = md5(trim(lower(regexp_replace(c.text, '\\s+', ' ', 'g'))))))
    """,
)
def decontaminate_exact_survivors(spark, sf_dir):
    """Exact decontamination: corpus docs whose normalized content
    appears in the reference set (every 7th doc) are dropped;
    null-text docs are never dropped (unknown content is not evidence
    of contamination). sum(doc_id) pins exact membership."""
    d = _t(spark, sf_dir, "documents")
    corpus = d.where(F.col("doc_id") < 150).select("doc_id", "text")
    reference = d.where(F.col("doc_id") % 7 == 0).select("text")
    out = dd.decontaminate(corpus, reference, mode="exact")
    return out.agg(F.count(F.lit(1)).alias("n_survivors"),
                   F.sum("doc_id").alias("sum_ids"))


@register(
    "decontaminate_winnow_survivors",
    f"""
    WITH {_winnow_ctes(
        "(SELECT doc_id, text FROM documents WHERE doc_id < 150)", "c")},
    {_winnow_ctes(
        "(SELECT doc_id, 'BENCHMARK QUESTION: ' || substring(text, 1, 120) "
        "AS text FROM documents "
        "WHERE doc_id % 10 = 0 AND doc_id < 150 AND text IS NOT NULL)", "r")},
    cpost AS (SELECT doc_id, unnest(fps) AS fp FROM cfps),
    rfp AS (SELECT DISTINCT unnest(fps) AS fp FROM rfps),
    contaminated AS (
      SELECT doc_id FROM cpost JOIN rfp USING (fp)
      GROUP BY doc_id HAVING count(*) >= 5
    )
    SELECT count(*) AS n_survivors, CAST(sum(doc_id) AS BIGINT) AS sum_ids
    FROM documents
    WHERE doc_id < 150
      AND doc_id NOT IN (SELECT doc_id FROM contaminated)
    """,
)
def decontaminate_winnow_survivors(spark, sf_dir):
    """Passage-level decontamination: the reference quotes a 120-char
    passage of every 10th doc inside benchmark framing text; winnowing
    overlap must drop exactly those docs from the corpus."""
    d = _t(spark, sf_dir, "documents")
    corpus = d.where(F.col("doc_id") < 150).select("doc_id", "text")
    reference = d.where(
        (F.col("doc_id") % 10 == 0) & (F.col("doc_id") < 150)
        & F.col("text").isNotNull()).select(
        "doc_id",
        F.concat(F.lit("BENCHMARK QUESTION: "),
                 F.substring(F.col("text"), 1, 120)).alias("text"))
    out = dd.decontaminate(corpus, reference, mode="winnow")
    return out.agg(F.count(F.lit(1)).alias("n_survivors"),
                   F.sum("doc_id").alias("sum_ids"))


@register(
    "decontaminate_minhash_survivors",
    f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 150
    ),
    ref AS (
      SELECT text || '{_TRAILER}' AS rt FROM documents
      WHERE doc_id < 150 AND doc_id % 6 = 0
    ),
    cn AS (SELECT doc_id, {_NORM.format(col='text')} AS nt FROM corpus),
    csh AS (SELECT doc_id, {_SHINGLES.format(n='nt')} AS sh FROM cn),
    csh2 AS (SELECT doc_id, sh FROM csh WHERE len(sh) > 0),
    csig AS (SELECT doc_id, {_duck_minhash_list(16)} AS sig FROM csh2),
    rn AS (SELECT {_NORM.format(col='rt')} AS nt FROM ref),
    rsh AS (SELECT {_SHINGLES.format(n='nt')} AS sh FROM rn),
    rsh2 AS (SELECT sh FROM rsh WHERE len(sh) > 0),
    rsig0 AS (SELECT {_duck_minhash_list(16)} AS sig FROM rsh2),
    rsig AS (SELECT DISTINCT sig FROM rsig0),
    cband AS ({_duck_band_rows_from('csig', 'doc_id', 4, 4)}),
    rband AS ({_duck_band_rows_from('rsig', 'sig AS ref_sig', 4, 4)}),
    cand AS (
      SELECT DISTINCT c.doc_id, r.ref_sig
      FROM cband c JOIN rband r USING (band_ix, band_key)
    ),
    est AS (
      SELECT cand.doc_id,
             list_sum(list_transform(generate_series(1, 16),
                 i -> CASE WHEN csig.sig[i] = cand.ref_sig[i]
                      THEN 1 ELSE 0 END)) / 16.0 AS frac
      FROM cand JOIN csig USING (doc_id)
    ),
    contaminated AS (SELECT DISTINCT doc_id FROM est WHERE frac >= 0.5)
    SELECT count(*) AS n_survivors, CAST(sum(doc_id) AS BIGINT) AS sum_ids
    FROM corpus
    WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
    """,
)
def decontaminate_minhash_survivors(spark, sf_dir):
    """Fuzzy (MinHash/LSH) decontamination: the reference holds EDITED
    near-duplicates (appended trailer) of every 6th corpus doc — exact
    fingerprints miss them, the signature-estimated Jaccard catches
    them. sum(doc_id) pins exact survivor membership."""
    from datacanary_spark.plans.caching import CacheScope

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d.where(F.col("doc_id") < 150)
    reference = corpus.where(F.col("doc_id") % 6 == 0).select(
        F.concat(F.col("text"), F.lit(_TRAILER)).alias("text"))
    # CacheScope (r06): the corpus (id, sig) frame feeds BOTH the band
    # explode and the verify join — unpersisted, the full shingle+
    # 16-seed-md5 pass runs twice per execution (the operator's own
    # docstring caveat). The result is one aggregate row, so
    # materialize inside the scope and return it as a local frame
    # (same pattern as classifier_top_fraction_by_lang).
    from datacanary_spark.entry_queries import _local_result

    with CacheScope() as scope:
        out = dd.decontaminate_minhash(corpus, reference, threshold=0.5,
                                       persist=scope)
        return _local_result(
            spark,
            out.agg(F.count(F.lit(1)).alias("n_survivors"),
                    F.sum("doc_id").alias("sum_ids")),
            "n_survivors bigint, sum_ids bigint")


# ---------------------------------------------------------------------------
# Batch-incremental ingest (plans/incremental.py). The store's semantics
# are batch-split invariant, which is precisely what makes an oracle
# possible: the accepted set is definable WITHOUT batches — a doc is
# dropped iff its content hash was seen by a lower-precedence doc, or a
# preceding banded exact-survivor shares an LSH band with estimated
# Jaccard >= threshold. The Spark side ingests in TWO batches through a
# real on-disk store (create → ingest → ingest → reopen), the oracle
# computes the batch-free formulation; equality proves both the rule
# and its split invariance on driver data.
# ---------------------------------------------------------------------------

def _duck_sig_est(n_hashes: int) -> str:
    return (f"len(list_filter(generate_series(1, {n_hashes}), "
            f"i -> sa.sig[i] = sb.sig[i])) / {float(n_hashes)}")


_INCREMENTAL_SQL = f"""
    WITH corpus AS (
      SELECT doc_id, text, lang FROM documents WHERE doc_id < 150
      UNION ALL
      SELECT doc_id + 100000 AS doc_id, text || '{_TRAILER}' AS text, lang
      FROM documents WHERE doc_id < 150 AND doc_id % 3 = 0
      UNION ALL
      SELECT doc_id + 200000 AS doc_id, text, lang
      FROM documents WHERE doc_id < 150 AND doc_id % 7 = 0
    ),
    surv AS (
      SELECT c.* FROM corpus c WHERE c.doc_id IN (
        SELECT min(doc_id) FROM corpus
        GROUP BY CASE WHEN text IS NULL THEN '<NULL>#' || doc_id
                 ELSE md5(text) END)
    ),
    norm AS (SELECT doc_id, {_NORM.format(col='text')} AS nt FROM surv),
    sh AS (SELECT doc_id, {_SHINGLES.format(n='nt')} AS sh FROM norm
           WHERE nt IS NOT NULL),
    banded AS (SELECT doc_id, sh FROM sh WHERE len(sh) > 0),
    sig AS (SELECT doc_id, {_duck_minhash_list(16)} AS sig FROM banded),
    bandrows AS ({_duck_band_rows(4, 4)}),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bandrows a JOIN bandrows b USING (band_ix, band_key)
      WHERE a.doc_id > b.doc_id
    ),
    dropped AS (
      SELECT DISTINCT id_a FROM cand
      JOIN sig sa ON sa.doc_id = cand.id_a
      JOIN sig sb ON sb.doc_id = cand.id_b
      WHERE {_duck_sig_est(16)} >= 0.5
    )
    SELECT doc_id, lang FROM surv
    WHERE doc_id NOT IN (SELECT id_a FROM dropped)
"""


@register("incremental_ingest_accepted", _INCREMENTAL_SQL)
def incremental_ingest_accepted(spark, sf_dir):
    """Two-batch incremental ingest through a real on-disk SignatureStore
    vs the batch-free formulation of the same precedence rule. The
    result is materialized before the temp store is deleted (the driver
    collects lazily, after this function returns)."""
    import shutil
    import tempfile

    from datacanary_spark.plans.incremental import SignatureStore

    d = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang") \
        .where(F.col("doc_id") < 150)
    near = d.where(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(_TRAILER)).alias("text"), "lang")
    exact = d.where(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 200000).alias("doc_id"), "text", "lang")
    corpus = d.unionByName(near).unionByName(exact)

    root = tempfile.mkdtemp(prefix="incstore_")
    try:
        store = SignatureStore.create(spark, root, threshold=0.5)
        acc0 = store.ingest(corpus.where(F.col("doc_id") < 150), 0)
        # reopen from disk: batch 1 must see batch 0 purely through the
        # persisted identities, not driver state
        store = SignatureStore.open(spark, root)
        acc1 = store.ingest(corpus.where(F.col("doc_id") >= 150), 1)
        rows = [(r.doc_id, r.lang)
                for r in acc0.unionByName(acc1)
                               .select("doc_id", "lang").collect()]
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(rows, "doc_id bigint, lang string")


# ---------------------------------------------------------------------------
# Transitive near-dup clusters (operators/graph.py connected components).
# The corpus plants CHAINS: c1 = base + trailer, c2 = base + trailer +
# long second trailer — c2 stays similar to c1 but can fall below the
# threshold vs base, so the cluster {base, c1, c2} only forms through
# the transitive closure, which is exactly what the large-star /
# small-star iteration must deliver. The oracle computes the closure
# with a recursive CTE over the SAME pair set.
# ---------------------------------------------------------------------------

_TRAILER2 = (" and a considerably longer second perturbation trailer whose"
             " extra shingles push this copy further from the original"
             " while staying close to the first near duplicate copy")

_COMPONENTS_CTE = f"""
    WITH RECURSIVE corpus AS (
      SELECT doc_id, text, lang FROM documents WHERE doc_id < 150
      UNION ALL
      SELECT doc_id + 100000 AS doc_id, text || '{_TRAILER}' AS text, lang
      FROM documents WHERE doc_id < 150 AND doc_id % 3 = 0
      UNION ALL
      SELECT doc_id + 200000 AS doc_id,
             text || '{_TRAILER}' || '{_TRAILER2}' AS text, lang
      FROM documents WHERE doc_id < 150 AND doc_id % 6 = 0
    ),
    norm AS (SELECT doc_id, {_NORM.format(col='text')} AS nt FROM corpus),
    sh AS (SELECT doc_id, {_SHINGLES.format(n='nt')} AS sh FROM norm),
    sig AS (SELECT doc_id, {_duck_minhash_list(16)} AS sig FROM sh),
    bandrows AS ({_duck_band_rows(4, 4)}),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bandrows a JOIN bandrows b USING (band_ix, band_key)
      WHERE a.doc_id < b.doc_id
    ),
    pairs AS (
      SELECT id_a, id_b
      FROM cand
      JOIN sh sa ON sa.doc_id = cand.id_a
      JOIN sh sb ON sb.doc_id = cand.id_b
      WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
            / len(list_distinct(list_concat(sa.sh, sb.sh))) >= 0.5
    ),
    sym AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs
    ),
    reach AS (
      SELECT u, v FROM sym
      UNION
      SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u
      WHERE s.v <> r.u
    ),
    comp AS (
      SELECT u AS doc_id, least(u, min(v)) AS component
      FROM reach GROUP BY u
    ),
    assigned AS (
      SELECT c.doc_id, coalesce(k.component, c.doc_id) AS component
      FROM corpus c LEFT JOIN comp k USING (doc_id)
    )
"""

_COMPONENTS_SQL = _COMPONENTS_CTE + """
    SELECT component, count(*) AS cluster_size,
           CAST(sum(doc_id) AS BIGINT) AS sum_ids
    FROM assigned GROUP BY component HAVING count(*) > 1
"""

# survivor pick mirrors the Spark aggregate min(struct(-rank, id)):
# highest rank wins, ties go to the smallest doc_id. The oracle uses a
# window (correctness only, tiny data); the Spark side deliberately
# does NOT — see graph.cluster_survivors.
_SURVIVORS_SQL = _COMPONENTS_CTE + """
    , ranked AS (
      SELECT a.component, c.doc_id, c.lang, length(c.text) AS n_chars
      FROM assigned a JOIN corpus c USING (doc_id)
    ),
    surv AS (
      SELECT component, doc_id, lang,
             row_number() OVER (PARTITION BY component
                                ORDER BY n_chars DESC, doc_id ASC) AS rn
      FROM ranked
    )
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_survivors,
           CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dropped,
           CAST(sum(CASE WHEN rn = 1 THEN doc_id ELSE 0 END) AS BIGINT)
             AS survivor_id_sum
    FROM surv GROUP BY lang
"""


@register("near_dup_components", _COMPONENTS_SQL)
def near_dup_components(spark, sf_dir):
    """Transitive near-dup clusters: MinHash-LSH pairs → large-star /
    small-star connected components → per-cluster aggregate (only the
    non-trivial clusters; singletons are pinned by the survivor count
    in the pytest suite)."""
    from datacanary_spark.operators.graph import components_of_pairs

    d = _t(spark, sf_dir, "documents").select("doc_id", "text").where(
        F.col("doc_id") < 150)
    c1 = d.where(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(_TRAILER)).alias("text"))
    c2 = d.where(F.col("doc_id") % 6 == 0).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(_TRAILER + _TRAILER2)).alias("text"))
    corpus = d.unionByName(c1).unionByName(c2)
    pairs = dd.near_dup_pairs(corpus, threshold=0.5)
    assigned = components_of_pairs(corpus, pairs.select("id_a", "id_b"))
    return (assigned.groupBy("component")
            .agg(F.count(F.lit(1)).alias("cluster_size"),
                 F.sum("doc_id").alias("sum_ids"))
            .where(F.col("cluster_size") > 1))


@register("near_dup_quality_survivors", _SURVIVORS_SQL)
def near_dup_quality_survivors(spark, sf_dir):
    """Cluster-level "keep the best copy" dedup (the FineWeb/RefinedWeb
    step after MinHash): transitive near-dup components, then one
    survivor per cluster by graph.cluster_survivors — here ranked by
    document length (a production run ranks by the trained classifier
    score or quality_score_expr; the operator takes any Column). The
    survivor_id_sum column pins WHICH doc won each cluster, not just
    how many — the longest variant, ties to the smallest id."""
    from datacanary_spark.operators.graph import cluster_survivors

    d = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang") \
        .where(F.col("doc_id") < 150)
    c1 = d.where(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(_TRAILER)).alias("text"), "lang")
    c2 = d.where(F.col("doc_id") % 6 == 0).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(_TRAILER + _TRAILER2)).alias("text"),
        "lang")
    corpus = d.unionByName(c1).unionByName(c2)
    pairs = dd.near_dup_pairs(corpus, threshold=0.5)
    flagged = cluster_survivors(corpus, pairs.select("id_a", "id_b"),
                                rank_col=F.length("text"))
    surv = F.col("is_survivor").cast("int")
    return (flagged.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(surv).alias("n_survivors"),
                 F.sum(1 - surv).alias("n_dropped"),
                 F.sum(surv * F.col("doc_id")).alias("survivor_id_sum")))


# ---------------------------------------------------------------------------
# Repeated-span removal (ExactSubstr-style, token-n-gram granularity).
# The corpus plants a fixed 12-token boilerplate sentence at the end of
# every %4 doc (twice for %8 docs — same-doc repeats must be removed
# too). Only the pure-boilerplate window repeats corpus-wide; windows
# spanning the doc/boilerplate junction are unique per doc. The oracle
# replicates window hashing, first-occurrence choice, and the
# interval-union of covered token positions.
# ---------------------------------------------------------------------------

_BOILER = ("this site uses cookies by continuing you accept our "
           "cookie policy terms")  # 12 tokens

_NGRAM_K = 12

_REPEATED_SQL = f"""
    WITH corpus AS (
      SELECT doc_id, lang,
             CASE WHEN text IS NULL THEN NULL
                  WHEN doc_id % 8 = 0
                    THEN text || ' {_BOILER}' || ' {_BOILER}'
                  WHEN doc_id % 4 = 0 THEN text || ' {_BOILER}'
                  ELSE text END AS text
      FROM documents WHERE doc_id < 200
    ),
    toks AS (
      SELECT doc_id, lang,
             list_filter(regexp_split_to_array(text, '\\s+'),
                         x -> x <> '') AS w
      FROM corpus WHERE text IS NOT NULL
    ),
    occ AS (
      SELECT doc_id, i - 1 AS start,
             md5(array_to_string(list_slice(w, i, i + {_NGRAM_K} - 1),
                                 ' ')) AS key
      FROM toks, unnest(generate_series(1, len(w) - {_NGRAM_K} + 1))
                 AS t(i)
      WHERE len(w) >= {_NGRAM_K}
    ),
    firsts AS (
      SELECT key, doc_id, start FROM (
        SELECT key, doc_id, start,
               row_number() OVER (PARTITION BY key
                                  ORDER BY doc_id, start) AS rn
        FROM occ) WHERE rn = 1
    ),
    rep AS (SELECT key FROM occ GROUP BY key HAVING count(*) >= 2),
    rem AS (
      SELECT o.doc_id, o.start FROM occ o
      JOIN rep USING (key)
      LEFT JOIN firsts f
        ON f.key = o.key AND f.doc_id = o.doc_id AND f.start = o.start
      WHERE f.key IS NULL
    ),
    covered AS (
      SELECT DISTINCT doc_id, start + u.p AS pos
      FROM rem, unnest(generate_series(0, {_NGRAM_K} - 1)) AS u(p)
    ),
    removed AS (
      SELECT doc_id, count(*) AS n_removed FROM covered GROUP BY doc_id
    )
    SELECT lang, count(*) AS n_docs,
           CAST(sum(len(w)) AS BIGINT) AS tokens_before,
           CAST(sum(len(w) - coalesce(n_removed, 0)) AS BIGINT)
             AS tokens_after
    FROM toks LEFT JOIN removed USING (doc_id)
    GROUP BY lang
"""


@register("repeated_ngram_removal_stats", _REPEATED_SQL)
def repeated_ngram_removal_stats(spark, sf_dir):
    """ExactSubstr-style repeated-window removal over planted
    boilerplate: per-language token counts before and after
    ``remove_repeated_ngrams`` (byte-level removal semantics are
    pinned in tests/test_dedup_similarity.py)."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text") \
        .where(F.col("doc_id") < 200)
    planted = F.when(F.col("text").isNull(), F.lit(None).cast("string")) \
        .when(F.col("doc_id") % 8 == 0,
              F.concat(F.col("text"), F.lit(f" {_BOILER} {_BOILER}"))) \
        .when(F.col("doc_id") % 4 == 0,
              F.concat(F.col("text"), F.lit(f" {_BOILER}"))) \
        .otherwise(F.col("text"))
    corpus = d.select("doc_id", "lang", planted.alias("text"))

    def n_tokens(col):
        return F.size(F.filter(F.split(col, r"\s+"),
                               lambda x: x != F.lit("")))

    out = dd.remove_repeated_ngrams(corpus.select("doc_id", "text"),
                                    k=_NGRAM_K, min_count=2)
    before = corpus.where(F.col("text").isNotNull()).select(
        "doc_id", "lang", n_tokens(F.col("text")).alias("_tb"))
    after = out.select("doc_id", n_tokens(F.col("text")).alias("_ta"))
    return (before.join(after, "doc_id")
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("_tb").alias("tokens_before"),
                 F.sum("_ta").alias("tokens_after")))


# ---------------------------------------------------------------------------
# Bloom-prefiltered decontamination (operators/membership.py)
# ---------------------------------------------------------------------------


@register(
    "bloom_decontam_by_lang",
    r"""
    SELECT lang,
           count(*) AS n_survivors,
           CAST(sum(doc_id) AS BIGINT) AS sum_ids
    FROM documents c
    WHERE text IS NULL OR NOT EXISTS (
      SELECT 1 FROM documents r
      WHERE r.doc_id % 5 = 0 AND r.text IS NOT NULL
        AND md5(trim(lower(regexp_replace(r.text, '\s+', ' ', 'g'))))
          = md5(trim(lower(regexp_replace(c.text, '\s+', ' ', 'g')))))
    GROUP BY lang
    """,
)
def bloom_decontam_by_lang(spark, sf_dir):
    """Decontamination via a broadcast Bloom bitset: identical result
    to the plain fingerprint anti-join (the oracle runs the NOT EXISTS
    form — a Bloom filter has no false negatives and every bitset hit
    is confirmed by an exact join), but scan-side rows the bitset
    rejects never reach a shuffle. At 10^9-fingerprint reference scale
    the bitset broadcast (~GB) replaces shuffling the corpus's
    fingerprints (~corpus-sized). sum_ids pins exact row membership."""
    from datacanary_spark.operators import membership as mb
    from datacanary_spark.plans.caching import CacheScope

    d = _t(spark, sf_dir, "documents")
    corpus = d.select("doc_id", "lang", "text")
    reference = d.where(F.col("doc_id") % 5 == 0).select("text")
    # CacheScope (r06): the operator's clean/confirm split is a UNION
    # whose branches otherwise re-scan the corpus and re-hash the
    # fingerprint + k probes each (its documented plan-shape caveat);
    # the result is 5 rows, so pin the projection in-scope and return
    # it locally.
    from datacanary_spark.entry_queries import _local_result

    with CacheScope() as scope:
        out = mb.decontaminate_bloom(corpus, reference, fpp=1e-3,
                                     persist=scope)
        return _local_result(
            spark,
            out.groupBy("lang").agg(
                F.count(F.lit(1)).alias("n_survivors"),
                F.sum("doc_id").alias("sum_ids")),
            "lang string, n_survivors bigint, sum_ids bigint")


# ---------------------------------------------------------------------------
# Split-leakage audit: near-dup pairs crossing the train/val/test boundary
# ---------------------------------------------------------------------------

from datacanary_spark.operators import corpus_stats as _cs  # noqa: E402

_LEAK_FRACTIONS = {"train": 0.8, "val": 0.1, "test": 0.1}


@register(
    "split_leakage_pairs",
    f"""
    WITH pairs AS ({_MINHASH_SQL}),
    cls AS (
      SELECT {_cs.duck_split_case('id_a', _LEAK_FRACTIONS)} AS split_a,
             {_cs.duck_split_case('id_b', _LEAK_FRACTIONS)} AS split_b,
             id_a, id_b
      FROM pairs
    )
    SELECT split_a, split_b, count(*) AS n_pairs,
           CAST(sum(id_a + id_b) AS BIGINT) AS sum_ids,
           split_a <> split_b AS leaked
    FROM cls
    GROUP BY split_a, split_b
    """,
)
def split_leakage_pairs(spark, sf_dir):
    """Contamination audit of an 80/10/10 hash split: every MinHash-LSH
    near-dup pair (the shared _minhash_corpus) is classified by the
    splits of its two sides; ``leaked`` rows are near-duplicates
    straddling the train/eval boundary — exactly what a doc-level hash
    split cannot prevent and a split audit must surface. The split is
    a pure CASE on each pair side (no assignment join); the audit
    costs one aggregation over the pair set."""
    pairs = dd.near_dup_pairs(_minhash_corpus(spark, sf_dir), threshold=0.5)
    return _cs.split_leakage_stats(pairs, "id_a", "id_b", _LEAK_FRACTIONS)


@register(
    "origin_split_leakage_pairs",
    f"""
    WITH pairs AS ({_MINHASH_SQL}),
    cls AS (
      SELECT {_cs.duck_split_case('id_a % 100000', _LEAK_FRACTIONS)}
                 AS split_a,
             {_cs.duck_split_case('id_b % 100000', _LEAK_FRACTIONS)}
                 AS split_b,
             id_a, id_b
      FROM pairs
    )
    SELECT split_a, split_b, count(*) AS n_pairs,
           CAST(sum(id_a + id_b) AS BIGINT) AS sum_ids,
           split_a <> split_b AS leaked
    FROM cls
    GROUP BY split_a, split_b
    """,
)
def origin_split_leakage_pairs(spark, sf_dir):
    """The group-aware-split fix audited: the same MinHash pairs, but
    the split key is the ORIGIN (doc_id mod 100000 — the base document
    a planted near-dup derives from, the fixture's stand-in for a url
    host). Every planted pair shares its origin, so by construction no
    planted pair leaks across the boundary — compare the leaked rows
    here against split_leakage_pairs to see what origin-keyed
    splitting buys. Same plan shape: a pure CASE per side, one
    aggregation over the pair set."""
    pairs = dd.near_dup_pairs(_minhash_corpus(spark, sf_dir), threshold=0.5)
    return _cs.split_leakage_stats(
        pairs, "id_a", "id_b", _LEAK_FRACTIONS,
        key_a=F.col("id_a") % 100000, key_b=F.col("id_b") % 100000)


# ---------------------------------------------------------------------------
# Exhaustive n-gram decontamination (GPT-3 appendix-C style): per-language
# contamination profile of the corpus against a reference subset, with the
# survivor set under an overlap-fraction threshold. The oracle builds the
# same 5-token spans with positional self-joins and the same md5 keys.
# ---------------------------------------------------------------------------

_NGDC_K = 5            # word k-gram size (13 at web scale; 5 fits fixture)
_NGDC_MAX_FRAC = 0.2   # survivors have overlap_frac <= this


@register(
    "ngram_decontam_by_lang",
    f"""
    WITH {_TOKS},
    spans AS (
      SELECT a.doc_id, a.lang,
             md5(a.w || ' ' || b.w || ' ' || c2.w || ' ' || d.w || ' ' || e.w)
               AS h
      FROM toks a
      JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
      JOIN toks c2 ON c2.doc_id = a.doc_id AND c2.pos = a.pos + 2
      JOIN toks d ON d.doc_id = a.doc_id AND d.pos = a.pos + 3
      JOIN toks e ON e.doc_id = a.doc_id AND e.pos = a.pos + 4
    ),
    ref AS (SELECT DISTINCT h FROM spans WHERE doc_id % 7 = 0),
    per_doc AS (
      SELECT s.doc_id, count(*) AS n,
             sum(CASE WHEN r.h IS NOT NULL THEN 1 ELSE 0 END) AS c
      FROM spans s LEFT JOIN ref r USING (h) GROUP BY 1
    ),
    all_docs AS (
      SELECT dd.doc_id, dd.lang,
             coalesce(CAST(p.c AS DOUBLE) / p.n, 0.0) AS frac
      FROM documents dd LEFT JOIN per_doc p USING (doc_id)
    )
    SELECT lang, count(*) AS n_docs,
           CAST(sum(CASE WHEN frac <= {_NGDC_MAX_FRAC} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_survivors,
           CAST(sum(CASE WHEN frac <= {_NGDC_MAX_FRAC} THEN doc_id ELSE 0 END)
                AS BIGINT) AS sum_survivor_ids,
           round(avg(frac), 6) AS mean_overlap_frac
    FROM all_docs GROUP BY lang
    """,
)
def ngram_decontam_by_lang(spark, sf_dir):
    """Exhaustive word-5-gram decontamination profile: the reference is
    the doc_id % 7 == 0 subset (a stand-in benchmark that guarantees
    planted 100%-contaminated docs — the refs themselves — plus partial
    overlaps from shared phrasing); per language, how many docs survive
    an overlap_frac <= 0.2 cut, their id-sum (exact membership pin),
    and the mean overlap fraction over ALL docs (absent-from-stats docs
    — NULL text or < k tokens — count as 0, the survivor-exemption
    rule). One broadcast probe join + two aggregations; the survivor
    set equals decontaminate_ngrams(k=5, max_overlap_frac=0.2) by
    construction (pinned in tests)."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    ref = d.where(F.col("doc_id") % 7 == 0).select("text")
    stats = dd.ngram_overlap_stats(d, ref, k=_NGDC_K)
    frac = F.coalesce(F.col("overlap_frac"), F.lit(0.0))
    surv = frac <= _NGDC_MAX_FRAC
    return (d.join(stats, "doc_id", "left")
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(surv.cast("int")).cast("long").alias("n_survivors"),
                 F.sum(F.when(surv, F.col("doc_id")).otherwise(0))
                  .cast("long").alias("sum_survivor_ids"),
                 F.bround(F.avg(frac), 6).alias("mean_overlap_frac")))
