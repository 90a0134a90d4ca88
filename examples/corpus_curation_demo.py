"""Library-composition example: the corpus-curation tier end to end —
exact dedup → C4-style line dedup → winnowing partial-overlap report →
deterministic stratified down-sampling — over the documents table.

This is the post-filter stage of a training-data pipeline: the
quality-filter example (filter_pipeline_demo.py) decides keep/drop per
document; this one shapes the kept corpus (dedup + mixing).

    python examples/corpus_curation_demo.py [path/to/documents.parquet]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(path: str = "/root/testdata/sf0.001/documents.parquet") -> dict:
    from pyspark.sql import functions as F

    from datacanary_spark.operators import corpus_stats as cs
    from datacanary_spark.operators import dedup as dd
    from datacanary_spark.session import get_spark
    from datacanary_spark.sources.io import read_table

    spark = get_spark(app_name="example_curation")
    docs = read_table(spark, path).select("doc_id", "text", "lang")
    n0 = docs.count()

    # 1. exact dedup (content-hash groupBy, deterministic min-id survivor)
    docs = dd.dedup_exact(docs)
    n1 = docs.count()

    # 2. line-level corpus dedup (C4-style: first occurrence survives)
    deduped_text = dd.dedup_lines(docs)
    docs = (docs.drop("text")
            .join(deduped_text, "doc_id")
            .where(F.length(F.trim("text")) > 0))
    n2 = docs.count()

    # 3. partial-overlap report (winnowing posting-list join)
    n_overlaps = dd.winnow_overlap_pairs(docs, min_shared=5).count()

    # 3b. fuzzy decontamination: remove docs NEAR-duplicate to a
    # (synthetic) benchmark holding edited copies of a few docs —
    # exact fingerprints would miss the edits, the MinHash tier won't
    bench = (docs.orderBy("doc_id").limit(3)
             .select(F.concat(F.col("text"),
                              F.lit(" reflowed benchmark edit"))
                     .alias("text")))
    docs = dd.decontaminate_minhash(docs, bench)
    n3 = docs.count()

    # 4. corpus mixing: deterministic per-language sample
    mix = {"en": 1.0, "de": 0.5, "fr": 0.5, "es": 0.25, "it": 0.25}
    sample = cs.hash_stratified_sample(docs, "lang", mix, "doc_id")
    by_lang = {r["lang"]: r["n"] for r in
               sample.groupBy("lang").agg(
                   F.count(F.lit(1)).alias("n")).collect()}

    summary = {"input_docs": n0, "after_exact_dedup": n1,
               "after_line_dedup_nonempty": n2,
               "after_minhash_decontamination": n3,
               "overlap_pairs": n_overlaps, "sampled_by_lang": by_lang}
    print(summary)
    return summary


if __name__ == "__main__":
    main(*sys.argv[1:])
