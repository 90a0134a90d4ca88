"""Generate a local sf1-scale testdata dir by deterministic 10x
upsampling of /root/testdata/sf0.1 (driver testdata is read-only, so
the scaled copy lives under the target dir, default /tmp/sf1).

Purpose (VERDICT r03 item 8): all exactness evidence so far is
sf0.01/sf0.1 — this gives the state-heavy queries (dedup family,
winnow, token shards, quantiles/deciles, rolling windows) one
oracle-exact run at 10x the bench scale, proving the exactness
discipline isn't scale-brittle. Both Spark and DuckDB read the same
generated parquet, so the upsampling itself cannot bias the compare.

Upsampling (replica k = 0..9, k=0 keeps originals byte-identical):
- documents: doc_id + k*100000; text prefixed with "v{k} " for k>0
  (near-dup rather than exact-dup replicas, so LSH buckets grow
  linearly, not quadratically); n_chars recomputed as length(text).
- events: event_id + k*1000000, ts shifted k*7 seconds (10x window
  density for the session/rolling-hour state), other columns as-is.
- embeddings: vec_id + k*100000, embedding[0] += k*1e-3 (distinct
  vectors; cosine structure preserved).
- all other tables: copied through unchanged.

Usage: python scripts/gen_sf1.py [target_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

SRC = "/root/testdata/sf0.1"
REPLICAS = 10
COPY_TABLES = ["region", "nation", "customer", "supplier", "part",
               "orders", "lineitem"]


def main() -> None:
    target = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    from pyspark.sql import functions as F

    from datacanary_spark.session import get_spark

    spark = get_spark(app_name="gen_sf1", master="local[8]")
    os.makedirs(target, exist_ok=True)

    for t in COPY_TABLES:
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite") \
            .parquet(f"{target}/{t}.parquet")

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    parts = []
    for k in range(REPLICAS):
        d = docs
        if k > 0:
            d = d.withColumn("text", F.concat(F.lit(f"v{k} "),
                                              F.col("text")))
        parts.append(d.select(
            (F.col("doc_id") + F.lit(k * 100000)).alias("doc_id"),
            "text", "lang", "source",
            F.length("text").cast("long").alias("n_chars")))
    up = parts[0]
    for p in parts[1:]:
        up = up.unionByName(p)
    up.repartition(16).write.mode("overwrite") \
        .parquet(f"{target}/documents.parquet")

    ev = spark.read.parquet(f"{SRC}/events.parquet")
    parts = [ev.select(
        (F.col("event_id") + F.lit(k * 1000000)).alias("event_id"),
        (F.col("ts") + F.expr(f"INTERVAL {k * 7} SECONDS")).alias("ts"),
        "user_id", "event_type", "value", "props")
        for k in range(REPLICAS)]
    up = parts[0]
    for p in parts[1:]:
        up = up.unionByName(p)
    up.repartition(16).write.mode("overwrite") \
        .parquet(f"{target}/events.parquet")

    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    parts = []
    for k in range(REPLICAS):
        e = emb
        if k > 0:
            bump = F.lit(float(k) * 1e-3)
            e = e.withColumn(
                "embedding",
                F.concat(F.array((F.col("embedding")[0] + bump)
                                 .cast("float")),
                         F.slice("embedding", 2, 1_000_000)))
        parts.append(e.select(
            (F.col("vec_id") + F.lit(k * 100000)).alias("vec_id"),
            "embedding", "label"))
    up = parts[0]
    for p in parts[1:]:
        up = up.unionByName(p)
    up.repartition(8).write.mode("overwrite") \
        .parquet(f"{target}/embeddings.parquet")

    for t in COPY_TABLES + ["documents", "events", "embeddings"]:
        n = spark.read.parquet(f"{target}/{t}.parquet").count()
        print(f"{t:12s} {n}")
    spark.stop()


if __name__ == "__main__":
    main()
