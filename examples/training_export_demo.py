"""Library-composition example: the training-data EXPORT tier —
deterministic train/val/test split, global corpus shuffle, sharded
write, and the split-leakage audit that should gate the split.

This is the last stage of the pipeline: the curation demo shapes the
corpus; this one turns it into the artifact a trainer consumes
(pseudorandom document order, fixed shard files, a frozen contamination
boundary) and shows WHY the audit matters — the same near-dup pairs
leak across a doc-level split and stop leaking across an origin-level
one.

    python examples/training_export_demo.py [path/to/documents.parquet]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(path: str = "/root/testdata/sf0.001/documents.parquet") -> dict:
    from pyspark.sql import functions as F

    from datacanary_spark.operators import corpus_stats as cs
    from datacanary_spark.operators import dedup as dd
    from datacanary_spark.session import get_spark
    from datacanary_spark.sources.io import read_table

    spark = get_spark(app_name="example_export")
    docs = read_table(spark, path).select("doc_id", "text", "lang")

    # 1. freeze the split (pure function of the key: later ingests
    #    never move a doc across the boundary)
    fr = {"train": 0.9, "val": 0.05, "test": 0.05}
    assigned = cs.split_assign(docs, "doc_id", fr)
    split_counts = {r["split"]: r["n"] for r in
                    assigned.groupBy("split")
                            .agg(F.count(F.lit(1)).alias("n")).collect()}

    # 2. audit it: do near-duplicates straddle the boundary? Plant
    #    recrawl-style near-dups (same document re-fetched under a new
    #    id, text lightly changed) so each pair has a real ORIGIN —
    #    the base doc — as url-host recrawls would
    recrawl = docs.where(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" recrawl banner")).alias("text"),
        "lang")
    corpus = docs.unionByName(recrawl)
    pairs = dd.near_dup_pairs(corpus, threshold=0.5)
    audit = cs.split_leakage_stats(pairs, fractions=fr).collect()
    leaked = sum(r["n_pairs"] for r in audit if r["leaked"])

    # 3. the group-aware fix: split by the origin both sides of a
    #    recrawl pair share (id mod 100000 recovers the base doc —
    #    the stand-in for the url host)
    audit2 = cs.split_leakage_stats(
        pairs, fractions=fr,
        key_a=F.col("id_a") % 100000,
        key_b=F.col("id_b") % 100000).collect()
    leaked_origin = sum(r["n_pairs"] for r in audit2 if r["leaked"])

    # 4. export: global md5 shuffle -> one sorted file per (split,
    #    shard); byte-identical on re-run
    out = tempfile.mkdtemp(prefix="export_demo_")
    staged = cs.shuffle_to_shards(assigned, "doc_id", 4)
    cs.write_shards(staged, out, partition_cols=("split", "shard"))
    n_out = spark.read.parquet(out).count()

    summary = {"splits": split_counts,
               "near_dup_pairs": pairs.count(),
               "leaked_doc_level": leaked,
               "leaked_origin_level": leaked_origin,
               "exported_docs": n_out,
               "output": out}
    print(summary)
    return summary


if __name__ == "__main__":
    main(*sys.argv[1:])
