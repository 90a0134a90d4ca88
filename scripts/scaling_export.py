"""Strong-scaling (N→4N) measurement for the training-data export
path: split assignment + global md5 shuffle + sharded partitionBy
write (`cli export` / `corpus_stats.shuffle_to_shards`).

Same protocol as scripts/scaling_dedup.py (whose shared corpus
builder seeds this one): the SAME 320k-doc corpus on local[2] vs
local[8],
fresh JVM per leg with GC/JIT threads pinned to the leg's budget,
one unmeasured warm-up, then best-of-3 timed full exports (md5
permutation + one hash Exchange + local sort + parquet encode to a
throwaway dir). The no-Spark md5 thread control gives the box's own
hash-scaling ceiling for the same BENCH artifact comparability.

Usage:
    python scripts/scaling_export.py             # orchestrates both legs
    python scripts/scaling_export.py --cpus 2    # one leg, prints JSON
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_SHARDS = 16
SPLITS = {"train": 0.98, "val": 0.01, "test": 0.01}
CORPUS_PATH = "/tmp/scaling_export_corpus.parquet"
CORPUS_FILES = 64
REPLICAS = 16  # 20k base docs x 16 = 320k docs (~90 MB text): big
#               enough that shuffle + parquet encode dominate the
#               fixed job/commit overheads that flattened a 20k run


def build_export_corpus(spark):
    """320k-doc corpus for the export legs: the shared dedup corpus
    replicated with distinct doc_ids (placement keys stay unique).
    Materialized once as 64 balanced files, like the dedup corpus."""
    from pyspark.sql import functions as F

    from scripts.scaling_dedup import build_corpus

    if not os.path.exists(os.path.join(CORPUS_PATH, "_SUCCESS")):
        base = build_corpus(spark)
        big = (base.withColumn(
                   "rep", F.explode(F.sequence(F.lit(0),
                                               F.lit(REPLICAS - 1))))
               .select((F.col("doc_id") * REPLICAS + F.col("rep"))
                       .alias("doc_id"), "text"))
        big.repartition(CORPUS_FILES) \
            .write.mode("overwrite").parquet(CORPUS_PATH)
    return spark.read.parquet(CORPUS_PATH)


def run_leg(cpus: int) -> dict:
    from datacanary_spark.operators.corpus_stats import (
        shuffle_to_shards,
        split_assign,
        write_shards,
    )
    from datacanary_spark.session import get_spark

    spark = get_spark(app_name=f"scaling_export_{cpus}",
                      master=f"local[{cpus}]",
                      extra_conf={
                          # see scaling_dedup.run_leg: keep the 64
                          # balanced corpus files as 64 scan splits and
                          # pin JVM background threads to the leg
                          "spark.sql.files.maxPartitionBytes": "1048576",
                          "spark.sql.files.openCostInBytes": "0",
                          "spark.driver.extraJavaOptions":
                              f"-XX:ParallelGCThreads={cpus} "
                              f"-XX:ConcGCThreads={max(1, cpus // 4)} "
                              f"-XX:CICompilerCount={max(2, cpus // 2)}",
                      })
    corpus = build_export_corpus(spark)
    n_docs = corpus.count()

    def one_run() -> float:
        spark.catalog.clearCache()
        out = tempfile.mkdtemp(prefix=f"export_leg_{cpus}_")
        try:
            t0 = time.perf_counter()
            staged = shuffle_to_shards(
                split_assign(corpus, "doc_id", dict(SPLITS)),
                "doc_id", N_SHARDS)
            write_shards(staged, out, partition_cols=("split", "shard"))
            return time.perf_counter() - t0
        finally:
            shutil.rmtree(out, ignore_errors=True)

    one_run()  # warm-up: JIT + codegen + page cache
    times = [one_run() for _ in range(3)]
    best = min(times)
    spark.stop()
    return {"cpus": cpus, "n_docs": n_docs, "n_shards": N_SHARDS,
            "best_sec": round(best, 3),
            "all_sec": [round(t, 3) for t in times],
            "docs_per_sec": round(n_docs / best, 1)}


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--cpus", type=int, default=None)
    p.add_argument("--legs", default="2,8")
    args = p.parse_args()

    if args.cpus is not None:
        print(json.dumps(run_leg(args.cpus)))
        return

    from scripts.scaling_dedup import hardware_control

    legs = sorted(int(x) for x in args.legs.split(","))
    results = []
    for n in legs:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--cpus", str(n)],
            capture_output=True, text=True, check=True)
        line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
        results.append(json.loads(line))
        print(line)
    lo, hi = results[0], results[-1]
    ratio = hi["cpus"] / lo["cpus"]
    eff = lo["best_sec"] / (ratio * hi["best_sec"])
    print(json.dumps({
        "metric": "export_stage_strong_scaling",
        "legs": results,
        "core_ratio": ratio,
        "scaling_efficiency": round(eff, 3),
        "hardware_md5_control": hardware_control(),
        "protocol": "same corpus both legs; fresh JVM per leg; "
                    "warm-up + best-of-3 full exports (split + md5 "
                    "shuffle + sharded parquet write) to a throwaway "
                    "dir; control = no-Spark C md5 threads",
    }))


if __name__ == "__main__":
    main()
