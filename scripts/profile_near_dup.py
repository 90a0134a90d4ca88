"""One-off profiler for the exact embedding_near_dup_pairs regression
(VERDICT r02 'What's wrong' #3): times formulation variants at sf0.1
and prints whether the norm 'hoist' actually survives optimization.

Usage: python scripts/profile_near_dup.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from datacanary_spark.operators import similarity as sim  # noqa: E402
from datacanary_spark.session import get_spark  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def timed(name, df):
    t0 = time.perf_counter()
    n = df.count()
    dt = time.perf_counter() - t0
    print(f"{name:35s} {dt:7.2f}s  rows={n}")
    return dt


def variant_r01(df, threshold):
    left = df.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    right = df.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    pairs = left.join(right, F.col("id_a") < F.col("id_b"))
    return (pairs.withColumn("score", sim.cosine_expr(F.col("va"), F.col("vb")))
            .where(F.col("score") >= threshold)
            .select("id_a", "id_b", F.bround(F.col("score"), 6).alias("score")))


def variant_persist_base(spark, df, threshold):
    from pyspark.storagelevel import StorageLevel

    base = df.select(F.col("vec_id"), F.col("embedding").alias("_v"),
                     sim.norm_expr(F.col("embedding")).alias("_nrm")) \
             .persist(StorageLevel.MEMORY_AND_DISK)
    base.count()
    left = base.select(F.col("vec_id").alias("id_a"),
                       F.col("_v").alias("va"), F.col("_nrm").alias("na"))
    right = base.select(F.col("vec_id").alias("id_b"),
                        F.col("_v").alias("vb"), F.col("_nrm").alias("nb"))
    pairs = left.join(right, F.col("id_a") < F.col("id_b"))
    score = F.try_divide(sim.dot_expr(F.col("va"), F.col("vb")),
                         F.col("na") * F.col("nb"))
    out = (pairs.withColumn("score", score)
           .where(F.col("score") >= threshold)
           .select("id_a", "id_b", F.bround(F.col("score"), 6).alias("score")))
    return out, base


def main():
    spark = get_spark(app_name="profile_near_dup")
    df = spark.read.parquet(f"{SF}/embeddings.parquet")
    df.count()  # warm the scan

    cur = sim.embedding_near_dup_pairs(df, threshold=0.9)
    plan = cur._jdf.queryExecution().executedPlan().toString()
    print("current plan: BNLJ" if "BroadcastNestedLoopJoin" in plan
          else "current plan: other join")
    # does the hoisted _nrm survive, or is the projection collapsed into
    # the per-pair stage? Count dot-product aggregates in the join output
    import re
    print("plan aggregate() count:", len(re.findall(r"aggregate\(", plan)),
          "| plan chars:", len(plan))

    for name, build in [
        ("current (hoisted norms)", lambda: sim.embedding_near_dup_pairs(df, threshold=0.9)),
        ("r01 naive cosine", lambda: variant_r01(df, 0.9)),
    ]:
        timed(name, build())
    out, base = variant_persist_base(spark, df, 0.9)
    timed("hoisted + persisted base", out)
    base.unpersist()

    # second run of each to see warm-cache behavior
    timed("current (2nd run)", sim.embedding_near_dup_pairs(df, threshold=0.9))
    timed("r01 naive (2nd run)", variant_r01(df, 0.9))


if __name__ == "__main__":
    main()
