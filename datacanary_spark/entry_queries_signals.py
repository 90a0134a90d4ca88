"""Driver-contract queries: readability / code-detection / compression
signals (functions/readability.py) over the documents table.

`readability_by_lang` is fully oracle-checked: every aggregate is an
exact integer sum, with the corpus-level Flesch score and punctuation
density derived from those sums in one fixed division chain, so Spark
and single-threaded DuckDB agree bit-for-bit regardless of partition
order.

`compression_ratio_by_lang` has no SQL oracle (zlib isn't expressible
in SQL — the driver records the weaker rows-only check); its semantics
are pinned instead by tests/test_readability.py's golden twin, which
runs the identical zlib call in plain Python.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datacanary_spark.entry_queries import _t, _ts, register
from datacanary_spark.functions.heuristics import words_expr
from datacanary_spark.functions.readability import (
    CODE_LINE_RE,
    CODE_PUNCT_CLASS,
    code_line_count_expr,
    code_punct_count_expr,
    flesch_expr,
    make_compression_ratio_udf,
    sentence_count_expr,
    syllables_expr,
)

_DUCK_WORDS = r"list_filter(regexp_split_to_array(text, '\s+'), w -> w <> '')"


@register(
    "readability_by_lang",
    f"""
    WITH base AS (
      SELECT lang,
        len({_DUCK_WORDS}) AS wc,
        len(list_filter(regexp_split_to_array(text, '[.!?]+'),
            s -> trim(s) <> '')) AS sc,
        list_sum(list_transform({_DUCK_WORDS},
            w -> greatest(len(regexp_extract_all(lower(w), '[aeiouy]+')), 1)))
            AS syll,
        len(list_filter(regexp_split_to_array(text, '\n'),
            l -> regexp_matches(l, '{CODE_LINE_RE}'))) AS code_lines,
        length(text) - length(regexp_replace(text,
            '{CODE_PUNCT_CLASS}', '', 'g')) AS punct,
        length(text) AS nchars
      FROM documents
    )
    SELECT lang,
      CAST(sum(sc) AS BIGINT) AS total_sentences,
      CAST(sum(syll) AS BIGINT) AS total_syllables,
      CAST(sum(wc) AS BIGINT) AS total_words,
      round(206.835 - 1.015 * (sum(wc)::DOUBLE / sum(sc)::DOUBLE)
            - 84.6 * (sum(syll)::DOUBLE / sum(wc)::DOUBLE), 6) AS corpus_flesch,
      CAST(sum(code_lines) AS BIGINT) AS total_code_lines,
      round(sum(punct)::DOUBLE / sum(nchars)::DOUBLE, 6) AS code_punct_density
    FROM base GROUP BY lang
    """,
)
def readability_by_lang(spark, sf_dir):
    """Per-language readability + code-shape totals; corpus Flesch from
    exact integer sums (order-insensitive — see module docstring)."""
    # spread (r06): the whole per-row regex/tokenize load fuses into the
    # scan stage, and a single-row-group parquet file serializes it onto
    # one core — same reasoning as compression_ratio_by_lang below;
    # no-op at real scale, and the groupBy sums are order-insensitive.
    d = _ts(spark, sf_dir, "documents")
    col = F.col("text")
    d = d.withColumn("_w", words_expr(col)).select(
        "lang",
        F.size("_w").cast("long").alias("wc"),
        sentence_count_expr(col).alias("sc"),
        syllables_expr(F.col("_w")).alias("syll"),
        code_line_count_expr(F.split(col, "\n")).alias("code_lines"),
        code_punct_count_expr(col).alias("punct"),
        F.length(col).cast("long").alias("nchars"),
    )
    sum_wc, sum_sc = F.sum("wc"), F.sum("sc")
    sum_syll = F.sum("syll")
    return d.groupBy("lang").agg(
        sum_sc.alias("total_sentences"),
        sum_syll.alias("total_syllables"),
        sum_wc.alias("total_words"),
        F.bround(flesch_expr(sum_wc, sum_sc, sum_syll), 6).alias("corpus_flesch"),
        F.sum("code_lines").alias("total_code_lines"),
        F.bround(F.try_divide(F.sum("punct").cast("double"),
                              F.sum("nchars").cast("double")), 6)
        .alias("code_punct_density"),
    )


@register("compression_ratio_by_lang")  # no SQL oracle: zlib (see module doc)
def compression_ratio_by_lang(spark, sf_dir):
    """zlib compressibility distribution per language. Aggregates are
    chosen to be order-insensitive (count / min / max / threshold
    count), so the result is deterministic across partitionings even
    though the per-doc ratio comes from a pandas UDF."""
    d = _ts(spark, sf_dir, "documents")  # spread: UDF-heavy first stage
    ratio = make_compression_ratio_udf()(F.col("text"))
    d = d.select("lang", ratio.alias("r"))
    return d.groupBy("lang").agg(
        F.count("r").alias("n_docs"),
        F.bround(F.min("r"), 6).alias("min_ratio"),
        F.bround(F.max("r"), 6).alias("max_ratio"),
        F.sum((F.col("r") < 0.35).cast("long")).alias("n_high_compress"),
    )
