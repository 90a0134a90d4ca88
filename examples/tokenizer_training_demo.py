"""Library-composition example: train BOTH production tokenizer
families on a curated corpus and compare them — BPE (bottom-up greedy
merges, operators/bpe.py) vs Unigram-LM (top-down EM-pruned lexicon,
operators/unigram.py) — then tokenize the corpus with each and report
fertility (tokens per word) and compression (chars per token), the two
numbers tokenizer papers lead with.

The pattern real pipelines use at 10^12 docs: ONE vocabulary-sized
corpus pass feeds both trainers (word_freqs is shared), the sequential
merge/EM loops run on the driver over bounded heads, and the learned
tables ship back out inside scalar Arrow pandas UDFs — the corpus is
never collected, the models never exceed a few hundred KiB.

    python examples/tokenizer_training_demo.py [n_docs]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(n_docs: int = 1000) -> dict:
    from pyspark.sql import functions as F

    from datacanary_spark.operators import bpe, unigram
    from datacanary_spark.session import get_spark
    from datacanary_spark.sources.fixtures import pages_spark_df

    spark = get_spark(app_name="example_tokenizers")
    pages = pages_spark_df(spark, n_docs, seed=23).select("url", "text")

    # 1. train both families on the same corpus (deterministic)
    merges = bpe.learn_bpe_merges(pages, num_merges=400)
    lexicon = unigram.train_unigram(pages, vocab_size=1024)
    n_chars_vocab = sum(1 for t in lexicon if len(t) == 1)
    print(f"BPE: {len(merges)} merges  |  Unigram: {len(lexicon)} tokens "
          f"({n_chars_vocab} single-char)")

    # 2. tokenize with each — two narrow Arrow-UDF columns, one pass
    toked = unigram.apply_unigram(
        bpe.apply_bpe(pages, merges), lexicon)

    # 3. fertility + compression per tokenizer (one aggregation)
    words = F.size(F.filter(F.split(F.col("text"), r"\s+"),
                            lambda w: w != F.lit("")))
    chars = F.length(F.regexp_replace(F.col("text"), r"\s+", ""))
    stats = toked.where(F.col("text").isNotNull()).agg(
        F.sum(words).alias("words"),
        F.sum(chars).alias("chars"),
        F.sum(F.size("bpe_tokens")).alias("bpe_toks"),
        F.sum(F.size("unigram_tokens")).alias("ug_toks")).first()

    out = {
        "n_docs": n_docs,
        "bpe_merges": len(merges),
        "unigram_vocab": len(lexicon),
        "bpe_fertility": round(stats["bpe_toks"] / stats["words"], 3),
        "unigram_fertility": round(stats["ug_toks"] / stats["words"], 3),
        "bpe_chars_per_token": round(stats["chars"] / stats["bpe_toks"], 3),
        "unigram_chars_per_token": round(stats["chars"] / stats["ug_toks"],
                                         3),
    }
    for k, v in out.items():
        print(f"{k:26s} {v}")
    return out


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1000)
